package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Porter2

/** Boolean document-filter tree — the engine's query IR for attribute
  * filtering, mirroring the reference's `DocumentFilter` protobuf surface
  * (rs/proto/proto/muopdb.proto:83-114) and its planner semantics
  * (rs/index/src/query/planner.rs:63-129). `NotContains` is declared but
  * `todo!()` in the reference (planner.rs:120-123); here it is implemented
  * (anti-join), a strict superset. */
sealed trait DocFilter
object DocFilter {
  final case class And(children: Seq[DocFilter]) extends DocFilter
  final case class Or(children: Seq[DocFilter]) extends DocFilter
  /** Text containment: tokenize+stem `value`, AND all token posting lists
    * (planner.rs:70-119). For keyword fields the whole value is one term. */
  final case class Contains(field: String, value: String, keyword: Boolean = false) extends DocFilter
  final case class NotContains(field: String, value: String, keyword: Boolean = false) extends DocFilter
  /** Literal point-id list (IdsIter; planner.rs:52-54 sorts+dedups at plan
    * time — Catalyst's OptimizeIn does the same for us). */
  final case class Ids(pointIds: Seq[Long]) extends DocFilter
}

/** Compiles a [[DocFilter]] tree against a terms table
  * `[user_id, term, point_id]` into a DataFrame of matching
  * `[user_id, point_id]` — the id-set algebra of the reference's iterator
  * tree (And/Or/Ids/Term, rs/index/src/query/iters/mod.rs:22-27) expressed
  * as joins/unions that Catalyst plans (hash joins replace galloping
  * skip_to intersection; the right trade at batch scale, SURVEY §4). */
object FilterCompiler {
  private val cols = Seq("user_id", "point_id")

  /** Query-side term keys must run the SAME analyzer as the index side:
    * Porter2 for English (vi->en fallback as the reference), [[Snowball]]
    * for de/fr/es/pt/it/ru, lowercase passthrough otherwise
    * (mutable_segment.rs:92-99 symmetry). `lang` comes from the
    * collection's attribute schema. */
  def queryTerms(field: String, value: String, keyword: Boolean,
      lang: String = "english"): Seq[String] = {
    val english = lang == "english" || lang == "en" ||
      lang == "vietnamese" || lang == "vi"
    def stem1(t: String): String =
      if (english) Porter2.stem(t)
      else if (graft.functions.Snowball.supported(lang)) graft.functions.Snowball.stem(lang, t)
      else t
    if (keyword) Seq(s"$field:${value.toLowerCase}")
    else value.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      .map(t => s"$field:${stem1(t)}")
  }

  /** @param universe all live `[user_id, point_id]` — needed by negations.
    * @param fieldLang text-field language map (defaults to English). */
  def compile(filter: DocFilter, terms: DataFrame, universe: DataFrame,
      fieldLang: Map[String, String] = Map.empty): DataFrame = {
    val spark = terms.sparkSession
    def empty: DataFrame = universe.limit(0).select(cols.map(col): _*)
    def go(f: DocFilter): DataFrame = f match {
      case DocFilter.Ids(ids) =>
        universe.filter(col("point_id").isin(ids: _*)).select(cols.map(col): _*)
      case DocFilter.Contains(field, value, kw) =>
        val qts = queryTerms(field, value, kw, fieldLang.getOrElse(field, "english"))
        val bucketed = terms.columns.contains("term_bucket")
        if (qts.isEmpty) empty // empty token stream -> empty result (planner.rs:90-93)
        else qts.map { t =>
          // collection term indexes are term-hash partitioned: the bucket
          // predicate constant-folds and prunes directories pre-scan
          val scan =
            if (bucketed) terms.filter(
              col("term_bucket") ===
                pmod(xxhash64(lit(t)), lit(graft.core.Collection.termBuckets)) &&
                col("term") === lit(t))
            else terms.filter(col("term") === lit(t))
          scan.select(cols.map(col): _*)
        }.reduce((a, b) => a.join(b, cols, "left_semi")) // AndIter (and_iter.rs:26)
      case DocFilter.NotContains(field, value, kw) =>
        universe.select(cols.map(col): _*)
          .join(go(DocFilter.Contains(field, value, kw)), cols, "left_anti")
      case DocFilter.And(children) =>
        if (children.isEmpty) universe.select(cols.map(col): _*)
        else children.map(go).reduce((a, b) => a.join(b, cols, "left_semi"))
      case DocFilter.Or(children) =>
        if (children.isEmpty) empty
        else children.map(go).reduce(_ unionByName _).dropDuplicates(cols) // OrIter
    }
    go(filter).dropDuplicates(cols)
  }
}
