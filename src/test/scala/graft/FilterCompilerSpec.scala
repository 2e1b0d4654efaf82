package graft

import org.apache.spark.sql.functions._
import graft.operators.{DocFilter, FilterCompiler}

/** Filter/iterator algebra — fixtures from FIXTURES.md §1.4/§1.6
  * (rs/index/src/query/planner.rs:172-493, iters/mod.rs:66-80). */
class FilterCompilerSpec extends SparkSuite {
  import spark.implicits._

  private def universe(ids: Long*) =
    ids.map(i => (0L, i)).toDF("user_id", "point_id")

  private def terms(rows: (String, Long)*) =
    rows.map { case (t, p) => (0L, t, p) }.toDF("user_id", "term", "point_id")

  private def pts(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("point_id").collect().map(_.getLong(0)).sorted.toSeq

  test("iterator algebra: (A and B) or C = [3,4,5,6,7,8]") {
    // A=[1..5], B=[3..7], C=[4..8] as posting lists of three terms
    val t = terms(
      (1L to 5L).map(i => "f:a" -> i) ++
        (3L to 7L).map(i => "f:b" -> i) ++
        (4L to 8L).map(i => "f:c" -> i): _*)
    val u = universe(1L to 10L: _*)
    val f = DocFilter.Or(Seq(
      DocFilter.And(Seq(
        DocFilter.Contains("f", "a", keyword = true),
        DocFilter.Contains("f", "b", keyword = true))),
      DocFilter.Contains("f", "c", keyword = true)))
    assert(pts(FilterCompiler.compile(f, t, u)) === Seq(3L, 4L, 5L, 6L, 7L, 8L))
  }

  test("stemming Contains: 'running connections' matches only the doc with both stems") {
    // planner.rs:443-493: point 1 has field:run and field:connect; point 2 only field:run
    val t = terms("field:run" -> 1L, "field:connect" -> 1L, "field:run" -> 2L)
    val u = universe(1L, 2L)
    val got = FilterCompiler.compile(
      DocFilter.Contains("field", "running connections"), t, u)
    assert(pts(got) === Seq(1L))
  }

  test("Snowball goldens: de/fr/es/pt/it/ru stem inflections to one term") {
    import graft.functions.Snowball
    // per-language golden stems (hand-traced against the published
    // snowballstem.org algorithm descriptions)
    val goldens = Seq(
      ("de", Seq("laufen" -> "lauf", "laufst" -> "lauf", "katzen" -> "katz",
        "häuser" -> "haus", "bedeutung" -> "bedeut", "aufregend" -> "aufreg",
        "kategorien" -> "kategori")),
      ("fr", Seq("chanter" -> "chant", "chantez" -> "chant",
        "chantant" -> "chant", "nationale" -> "national",
        "nationaux" -> "national", "continuité" -> "continu",
        "importance" -> "import")),
      ("es", Seq("cantando" -> "cant", "cantar" -> "cant",
        "canciones" -> "cancion", "canción" -> "cancion",
        "importancia" -> "import", "niñas" -> "niñ",
        "rápidamente" -> "rapid")),
      ("pt", Seq("cantando" -> "cant", "cantar" -> "cant",
        "meninas" -> "menin", "menino" -> "menin",
        "felicidade" -> "felic", "rapidamente" -> "rapid")),
      ("it", Seq("cantando" -> "cant", "cantare" -> "cant",
        "nazionale" -> "nazional", "nazionali" -> "nazional",
        "abilità" -> "abil", "felicità" -> "felic")),
      ("ru", Seq("книгами" -> "книг", "книга" -> "книг", "книги" -> "книг",
        "красивые" -> "красив", "красивый" -> "красив",
        "делают" -> "дела", "делать" -> "дела", "важность" -> "важност")),
      ("da", Seq("bilerne" -> "bil", "huset" -> "hus", "hunden" -> "hund",
        "hundene" -> "hund", "løst" -> "løs", "bestemmelse" -> "bestem")),
      ("no", Seq("huset" -> "hus", "bilene" -> "bil", "katter" -> "katt",
        "vakkert" -> "vakker", "trygghet" -> "trygg")),
      ("sv", Seq("bilarna" -> "bil", "flickorna" -> "flick",
        "skönhet" -> "skön", "möjligheterna" -> "möj")),
      ("nl", Seq("katten" -> "kat", "boeken" -> "boek", "huizen" -> "huiz",
        "mogelijkheden" -> "mogelijk", "kleinste" -> "kleinst")))
    for ((lang, cases) <- goldens; (word, want) <- cases)
      assert(Snowball.stem(lang, word) === want, s"$lang: $word")
  }

  test("Snowball goldens: ro/fi/hu/tr/el/ar/ta stem inflections to one term") {
    import graft.functions.Snowball
    val goldens = Seq(
      ("ro", Seq("copiilor" -> "cop", "cartea" -> "cart", "cărţile" -> "cărţ",
        "lucrează" -> "lucr", "frumoasă" -> "frumoas", "românilor" -> "român")),
      ("fi", Seq("taloissa" -> "talo", "taloja" -> "talo", "kirjoissa" -> "kirj",
        "kirjat" -> "kirj")),
      ("hu", Seq("házakat" -> "ház", "gyermekeknek" -> "gyermek",
        "házban" -> "ház", "kertekben" -> "kert")),
      ("tr", Seq("kitapları" -> "kitap", "kitabı" -> "kitap", "evinde" -> "ev",
        "arabalar" -> "araba", "evlerinden" -> "ev")),
      ("el", Seq("βιβλία" -> "βιβλι", "βιβλίο" -> "βιβλι",
        "άνθρωποι" -> "ανθρωπ", "ανθρώπων" -> "ανθρωπ",
        "γεγονότα" -> "γεγον", "ονόματα" -> "ονομα")),
      ("ar", Seq("الكتاب" -> "كتاب", "كتابها" -> "كتاب",
        "المعلمون" -> "معلم", "مدرسة" -> "مدرس")),
      ("ta", Seq("புத்தகங்கள்" -> "புத்தக", "வீடுகள்" -> "வீடு",
        "வீட்டில்" -> "வீட்ட")))
    for ((lang, cases) <- goldens; (word, want) <- cases)
      assert(Snowball.stem(lang, word) === want, s"$lang: $word -> ${Snowball.stem(lang, word)}")
  }

  test("Snowball index/query symmetry per field lang (de and ru fields)") {
    // index side: analyze_text builds field:stem terms; query side:
    // queryTerms must produce the identical keys for each language
    import graft.functions.GraftFunctions._
    val docs = Seq(
      (0L, 1L, "Katzen laufen"), // german doc
      (0L, 2L, "Hunde bellen")).toDF("user_id", "point_id", "text")
    val t = docs.select(col("user_id"),
      explode(term_keys("text", analyze_text(col("text"), lit("german")))).as("term"),
      col("point_id"))
    val u = universe(1L, 2L)
    // query with a differently-inflected form: "katze läufst"? use
    // singular-ish inflections that share the stems katz/lauf
    val got = FilterCompiler.compile(
      DocFilter.Contains("text", "laufen katzen"), t, u,
      fieldLang = Map("text" -> "german"))
    assert(pts(got) === Seq(1L))

    val ruDocs = Seq(
      (0L, 1L, "красивые книги"),
      (0L, 2L, "другие вещи")).toDF("user_id", "point_id", "text")
    val rt = ruDocs.select(col("user_id"),
      explode(term_keys("text", analyze_text(col("text"), lit("russian")))).as("term"),
      col("point_id"))
    val got2 = FilterCompiler.compile(
      DocFilter.Contains("text", "красивый книга"), rt, u,
      fieldLang = Map("text" -> "russian"))
    assert(pts(got2) === Seq(1L))
  }

  test("unknown term and empty value yield empty results") {
    val t = terms("field:run" -> 1L)
    val u = universe(1L, 2L)
    assert(pts(FilterCompiler.compile(DocFilter.Contains("field", "nosuchterm"), t, u)).isEmpty)
    assert(pts(FilterCompiler.compile(DocFilter.Contains("field", "   "), t, u)).isEmpty)
  }

  test("Prefix: dictionary range match, fragment unanalyzed, composable") {
    val t = terms("f:scan" -> 1L, "f:sort" -> 1L, "f:merge" -> 2L,
      "f:stream" -> 3L, "f:scan" -> 3L, "g:sort" -> 4L)
    val u = universe(1L, 2L, 3L, 4L)
    // field-scoped: g:sort must not leak into a prefix over f
    assert(pts(FilterCompiler.compile(DocFilter.Prefix("f", "s"), t, u))
      === Seq(1L, 3L))
    assert(pts(FilterCompiler.compile(DocFilter.Prefix("f", "sc"), t, u))
      === Seq(1L, 3L))
    assert(pts(FilterCompiler.compile(DocFilter.Prefix("f", "sort"), t, u))
      === Seq(1L))
    assert(pts(FilterCompiler.compile(DocFilter.Prefix("f", "zz"), t, u))
      === Seq.empty)
    // composes through the id-set algebra like any other leaf
    assert(pts(FilterCompiler.compile(DocFilter.And(Seq(
      DocFilter.Prefix("f", "s"),
      DocFilter.NotContains("f", "stream", keyword = true))), t, u))
      === Seq(1L))
    // normalize: empty fragment and spaced text-field fragment refuse
    intercept[IllegalArgumentException] {
      DocFilter.normalize(DocFilter.Prefix("f", "  "), _ => false)
    }
    intercept[IllegalArgumentException] {
      DocFilter.normalize(DocFilter.Prefix("f", "two words"), _ => false)
    }
    // ...but a keyword field's whole-value terms may contain spaces
    assert(DocFilter.normalize(DocFilter.Prefix("f", "new y"), _ => true)
      === DocFilter.Prefix("f", "new y", keyword = true))
  }

  test("Fuzzy: Levenshtein dictionary expansion, field-scoped, distance-bounded") {
    val t = terms("f:agg" -> 1L, "f:a" -> 2L, "f:big" -> 3L, "f:sort" -> 4L,
      "g:agg" -> 5L)
    val u = universe(1L, 2L, 3L, 4L, 5L)
    // dist 0: exact only
    assert(pts(FilterCompiler.compile(DocFilter.Fuzzy("f", "agg", 0), t, u))
      === Seq(1L))
    // dist 2: agg(0), a(2), big(2) — sort(4) and g:agg stay out
    assert(pts(FilterCompiler.compile(DocFilter.Fuzzy("f", "agg", 2), t, u))
      === Seq(1L, 2L, 3L))
    // the query term is ANALYZED (stemmed) before the dictionary scan:
    // "aggs" stems to agg -> same matches at dist 0
    assert(pts(FilterCompiler.compile(DocFilter.Fuzzy("f", "aggs", 0), t, u))
      === Seq(1L))
    // prefix_length (the range-pruning scale lever, Lucene semantics):
    // matches must share the first chars literally — 'big' (first-char
    // edit) drops out at prefixLength=1, 'a' and 'agg' stay
    assert(pts(FilterCompiler.compile(
      DocFilter.Fuzzy("f", "agg", 2, prefixLength = 1), t, u)) === Seq(1L, 2L))
    assert(pts(FilterCompiler.compile(
      DocFilter.Fuzzy("f", "agg", 2, prefixLength = 2), t, u)) === Seq(1L))
    // normalize validation
    intercept[IllegalArgumentException] {
      DocFilter.normalize(DocFilter.Fuzzy("f", "agg", -1), _ => false)
    }
    intercept[IllegalArgumentException] {
      DocFilter.normalize(DocFilter.Fuzzy("f", "two words"), _ => false)
    }
    intercept[IllegalArgumentException] {
      DocFilter.normalize(DocFilter.Fuzzy("f", "agg", 1, prefixLength = -1), _ => false)
    }
  }

  test("Regex/Wildcard: anchored full-token match, prefix seek, translation") {
    val t = terms("f:scan" -> 1L, "f:spark" -> 2L, "f:stream" -> 3L,
      "f:part" -> 4L, "f:data" -> 4L, "g:spark" -> 5L)
    val u = universe(1L, 2L, 3L, 4L, 5L)
    // anchored: `s.a.` matches scan only (spark/stream are longer)
    assert(pts(FilterCompiler.compile(DocFilter.Regex("f", "s.a."), t, u))
      === Seq(1L))
    // leading literal seek + tail: `spa.*k` — field-scoped (g:spark out)
    assert(pts(FilterCompiler.compile(DocFilter.Regex("f", "spa.*k"), t, u))
      === Seq(2L))
    // alternation across the dictionary
    assert(pts(FilterCompiler.compile(DocFilter.Regex("f", "part|data"), t, u))
      === Seq(4L))
    // wildcard translation: `s*k` -> `s.*k`; `?art` -> `.art`; `*a*`
    assert(pts(FilterCompiler.compile(DocFilter.Wildcard("f", "s*k"), t, u))
      === Seq(2L))
    assert(pts(FilterCompiler.compile(DocFilter.Wildcard("f", "?art"), t, u))
      === Seq(4L))
    assert(pts(FilterCompiler.compile(DocFilter.Wildcard("f", "*a*"), t, u))
      === Seq(1L, 2L, 3L, 4L))
    assert(DocFilter.wildcardToRegex("a*b?c.d") === "a.*b.c\\.d")
    assert(DocFilter.regexLiteralPrefix("spa.*k") === "spa")
    assert(DocFilter.regexLiteralPrefix(".a..") === "")
    // the prefix is only sound when EVERY match needs it: alternation has
    // no required prefix (the bug this case pins — `small|sort` must not
    // seek to `small`); a quantifier makes the preceding char optional
    assert(DocFilter.regexLiteralPrefix("small|sort") === "")
    assert(DocFilter.regexLiteralPrefix("ab*") === "a")
    assert(DocFilter.regexLiteralPrefix("ab+c") === "a")
    assert(DocFilter.regexLiteralPrefix("a{1,2}") === "")
    assert(DocFilter.regexLiteralPrefix("\\dab") === "")
    // normalize rejects a malformed pattern at the entry point
    val e = intercept[IllegalArgumentException] {
      DocFilter.normalize(DocFilter.Regex("f", "[unclosed"), _ => false)
    }
    assert(e.getMessage.contains("invalid pattern"))
  }

  test("Range: numeric attribute predicate through the id-set algebra") {
    val u = Seq((0L, 1L, Some(100L)), (0L, 2L, Some(200L)), (0L, 3L, Some(300L)),
      (0L, 4L, None: Option[Long])).toDF("user_id", "point_id", "n")
    val t = terms("f:a" -> 1L, "f:a" -> 3L)
    def range(lo: Option[Double], hi: Option[Double]) =
      FilterCompiler.compile(DocFilter.Range("n", lo, hi), t, u)
    assert(pts(range(Some(150), Some(300))) === Seq(2L, 3L)) // inclusive both ends
    assert(pts(range(Some(250), None)) === Seq(3L)) // open high side
    assert(pts(range(None, Some(100))) === Seq(1L)) // null attr never matches
    // composes with term leaves through the algebra
    assert(pts(FilterCompiler.compile(DocFilter.And(Seq(
      DocFilter.Contains("f", "a", keyword = true),
      DocFilter.Range("n", Some(150), None))), t, u)) === Seq(3L))
    // a universe without the column fails loudly, not silently empty
    val e = intercept[IllegalArgumentException] {
      FilterCompiler.compile(DocFilter.Range("missing", Some(1), None), t, u)
    }
    assert(e.getMessage.contains("missing"))
    // normalize validation: empty and inverted bounds refuse
    intercept[IllegalArgumentException] {
      DocFilter.normalize(DocFilter.Range("n"), _ => false)
    }
    intercept[IllegalArgumentException] {
      DocFilter.normalize(DocFilter.Range("n", Some(5), Some(1)), _ => false)
    }
  }

  test("served editDistance agrees with Spark's levenshtein (parity kernel)") {
    val words = Seq("", "a", "agg", "big", "sort", "stream", "scan",
      "merge", "merg", "customer", "custom", "kitten", "sitting")
    val pairs = for (x <- words; y <- words) yield (x, y)
    val viaSpark = pairs.toDF("x", "y")
      .select(levenshtein(col("x"), col("y"))).collect().map(_.getInt(0))
    val viaServed = pairs.map { case (x, y) =>
      graft.core.ServedUserView.editDistance(x, y) }
    assert(viaServed === viaSpark.toSeq,
      "served fuzzy must agree with the distributed dictionary scan")
  }

  test("NotContains implements the todo!() of planner.rs:120-123") {
    val t = terms("field:run" -> 1L, "field:walk" -> 2L)
    val u = universe(1L, 2L, 3L)
    val got = FilterCompiler.compile(DocFilter.NotContains("field", "running"), t, u)
    assert(pts(got) === Seq(2L, 3L))
  }

  test("Ids filter + empty And/Or edge cases") {
    val t = terms("f:x" -> 1L)
    val u = universe(1L, 2L, 3L)
    assert(pts(FilterCompiler.compile(DocFilter.Ids(Seq(2L, 3L, 99L)), t, u)) === Seq(2L, 3L))
    assert(pts(FilterCompiler.compile(DocFilter.And(Nil), t, u)) === Seq(1L, 2L, 3L))
    assert(pts(FilterCompiler.compile(DocFilter.Or(Nil), t, u)).isEmpty)
  }
}
