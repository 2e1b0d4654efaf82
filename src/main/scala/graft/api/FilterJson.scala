package graft.api

import graft.operators.DocFilter

/** Recursive DocumentFilter tree from parsed JSON — the full reference
  * proto surface (muopdb.proto:83-114): `{and:[...]}`, `{or:[...]}`,
  * `{not_contains:{field,value,keyword?}}`, `{ids:[...]}`, the bare
  * `{field, value, keyword?}` Contains leaf (also the historic
  * single-leaf format, so existing clients keep working), and the
  * beyond-proto extensions `{phrase:{...}}` / `{near:{...}}` (positional)
  * and `{prefix:{...}}` / `{fuzzy:{...}}` (dictionary multi-term).
  *
  * Shared by the HTTP surface ([[GraftHttpServer]]) and the SQL TVF
  * (`graft_term_search`) so the two accept byte-identical filter JSON. */
object FilterJson {

  private def u64(v: Any): java.math.BigInteger = v match {
    case s: String => new java.math.BigInteger(s)
    case d: Double => new java.math.BigDecimal(d).toBigInteger
    case other => new java.math.BigInteger(String.valueOf(other))
  }

  def parse(v: Any): DocFilter = {
    val m = Json.obj(v)
    // proto Contains/NotContainsFilter name the field "path"
    // (muopdb.proto:104-112); the legacy shape says "field"
    def leaf(c: Map[String, Any]): (String, String, Boolean) = (
      c.getOrElse("path", c.getOrElse("field", sys.error(s"missing path: $c")))
        .asInstanceOf[String],
      c("value").asInstanceOf[String],
      c.getOrElse("keyword", false).asInstanceOf[Boolean])
    // proto AndFilter/OrFilter wrap the list in {filters: [...]}
    def branch(x: Any): Vector[Any] = x match {
      case vec: Vector[_] => vec.asInstanceOf[Vector[Any]]
      case other => Json.obj(other)("filters").asInstanceOf[Vector[Any]]
    }
    if (m.contains("and"))
      DocFilter.And(branch(m("and")).map(parse))
    else if (m.contains("or"))
      DocFilter.Or(branch(m("or")).map(parse))
    else if (m.contains("not_contains")) {
      val (f, value, kw) = leaf(Json.obj(m("not_contains")))
      DocFilter.NotContains(f, value, kw)
    } else if (m.contains("contains")) {
      val (f, value, kw) = leaf(Json.obj(m("contains")))
      DocFilter.Contains(f, value, kw)
    } else if (m.contains("phrase")) {
      // beyond-proto extension: {phrase: {path|field, value, keyword?}} —
      // consecutive analyzed tokens via the positions-bearing term index
      val (f, value, kw) = leaf(Json.obj(m("phrase")))
      DocFilter.Phrase(f, value, kw)
    } else if (m.contains("near")) {
      // beyond-proto extension: {near: {path|field, left, right, window}}
      val c = Json.obj(m("near"))
      DocFilter.Near(
        c.getOrElse("path", c.getOrElse("field", sys.error(s"missing path: $c")))
          .asInstanceOf[String],
        c("left").asInstanceOf[String],
        c("right").asInstanceOf[String],
        u64(c.getOrElse("window", 1)).intValue())
    } else if (m.contains("prefix")) {
      // beyond-proto extension: {prefix: {path|field, value, keyword?}} —
      // Lucene PrefixQuery over the term dictionary (fragment unanalyzed)
      val (f, value, kw) = leaf(Json.obj(m("prefix")))
      DocFilter.Prefix(f, value, kw)
    } else if (m.contains("fuzzy")) {
      // beyond-proto extension: {fuzzy: {path|field, value, max_dist?,
      // prefix_length?, keyword?}} — Lucene FuzzyQuery (Levenshtein <=
      // max_dist over the analyzed dictionary, default 1; prefix_length
      // is the range-pruning scale lever, default 0)
      val c = Json.obj(m("fuzzy"))
      val (f, value, kw) = leaf(c)
      DocFilter.Fuzzy(f, value, u64(c.getOrElse("max_dist", 1)).intValue(), kw,
        u64(c.getOrElse("prefix_length", 0)).intValue())
    } else if (m.contains("regexp")) {
      // beyond-proto: {regexp: {path|field, value}} — Lucene RegexpQuery
      // (anchored full-token match, Java regex syntax)
      val (f, value, kw) = leaf(Json.obj(m("regexp")))
      DocFilter.Regex(f, value, kw)
    } else if (m.contains("wildcard")) {
      // beyond-proto: {wildcard: {path|field, value}} — `*`/`?` globs
      val (f, value, kw) = leaf(Json.obj(m("wildcard")))
      DocFilter.Wildcard(f, value, kw)
    } else if (m.contains("range")) {
      // beyond-proto: {range: {path|field, gte?, lte?}} — numeric
      // attribute range (ES range-query shape), inclusive bounds
      val c = Json.obj(m("range"))
      def num(k: String): Option[Double] = c.get(k).map {
        case d: Double => d
        case s: String => s.toDouble
        case other => String.valueOf(other).toDouble
      }
      DocFilter.Range(
        c.getOrElse("path", c.getOrElse("field", sys.error(s"missing path: $c")))
          .asInstanceOf[String],
        gte = num("gte"), lte = num("lte"))
    } else if (m.contains("ids")) {
      // proto IdsFilter nests {ids: [...]} one level when the filter
      // arrives as {ids: {ids: [...]}}; the legacy shape is flat. Ids may
      // be JSON numbers or strings (proto JSON emits uint64 as strings).
      val list = m("ids") match {
        case vec: Vector[_] => vec.asInstanceOf[Vector[Any]]
        case other => Json.obj(other)("ids").asInstanceOf[Vector[Any]]
      }
      DocFilter.Ids(list.map(x => u64(x).longValue()))
    } else {
      val (f, value, kw) = leaf(m)
      DocFilter.Contains(f, value, kw)
    }
  }
}
