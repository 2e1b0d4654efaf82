package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-character Unicode-script vote for language ID — the only part of
  * the language heuristic that genuinely needs per-char classing (the
  * stopword-profile branch is a native column chain in
  * [[GraftFunctions.lang_id]]). Kept out of the UDF path: the expression
  * is a single static call inside whole-stage codegen, no row boxing. */
object TextKernels {

  private val zh = UTF8String.fromString("zh")
  private val ja = UTF8String.fromString("ja")
  private val ko = UTF8String.fromString("ko")
  private val ru = UTF8String.fromString("ru")
  private val ar = UTF8String.fromString("ar")
  private val hi = UTF8String.fromString("hi")

  final def spanCorrupt(arr: ArrayData, seed: Long, startPermille: Int, meanSpan: Int): InternalRow = {
    import HashKernels.mix64
    val n = arr.numElements()
    val input = new java.lang.StringBuilder()
    val target = new java.lang.StringBuilder()
    var masked = 0L
    var spanIdx = 0
    var i = 0
    val maxSpans = 100 // sentinel vocabulary bound (T5 ships 100 extra ids)
    while (i < n) {
      val h = mix64(seed * 1000003L + i)
      val start = spanIdx < maxSpans &&
        java.lang.Math.floorMod(h, 1000L) < startPermille
      if (start) {
        var len = 1 + java.lang.Math.floorMod(mix64(h), (2L * meanSpan - 1L)).toInt
        if (len > n - i) len = n - i
        val sentinel = "<extra_id_" + spanIdx + ">"
        if (input.length > 0) input.append(' ')
        input.append(sentinel)
        if (target.length > 0) target.append(' ')
        target.append(sentinel)
        var j = 0
        while (j < len) {
          target.append(' ').append(arr.getUTF8String(i + j).toString)
          j += 1
        }
        masked += len
        spanIdx += 1
        i += len
      } else {
        if (input.length > 0) input.append(' ')
        input.append(arr.getUTF8String(i).toString)
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(input.toString), UTF8String.fromString(target.toString),
      masked, spanIdx.toLong))
  }

  final def normalizeText(text: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer.normalize(text.toString, java.text.Normalizer.Form.NFC)
    val nfd = java.text.Normalizer.normalize(nfc, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val c = nfd.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    val stripped = java.text.Normalizer.normalize(sb.toString, java.text.Normalizer.Form.NFC)
      .toLowerCase(java.util.Locale.ROOT)
    // collapse ASCII whitespace runs (RE2/Java '\s' class) + trim
    val out = new java.lang.StringBuilder(stripped.length)
    var j = 0
    var pendingSpace = false
    while (j < stripped.length) {
      val c = stripped.charAt(j)
      val ws = c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == 0x0B
      if (ws) { if (out.length > 0) pendingSpace = true }
      else { if (pendingSpace) { out.append(' '); pendingSpace = false }; out.append(c) }
      j += 1
    }
    UTF8String.fromString(out.toString)
  }

  /** Dominant-script language of `text`: "zh"/"ja"/"ko"/"ru"/"ar"/"hi"
    * when the corresponding script has the (strict) plurality of LETTER
    * characters, else null (Latin & everything else → stopword branch).
    * Hiragana and Katakana merge into one "ja" class. Ties between a
    * mapped class and the rest resolve toward null (the conservative
    * branch: stopword profiles still get a say). */
  final def scriptVote(text: UTF8String): UTF8String = {
    if (text == null) return null
    val s = text.toString
    var cZh = 0; var cJa = 0; var cKo = 0; var cRu = 0; var cAr = 0; var cHi = 0
    var cOther = 0
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      if (Character.isLetter(cp)) {
        Character.UnicodeScript.of(cp) match {
          case Character.UnicodeScript.HAN => cZh += 1
          case Character.UnicodeScript.HIRAGANA | Character.UnicodeScript.KATAKANA => cJa += 1
          case Character.UnicodeScript.HANGUL => cKo += 1
          case Character.UnicodeScript.CYRILLIC => cRu += 1
          case Character.UnicodeScript.ARABIC => cAr += 1
          case Character.UnicodeScript.DEVANAGARI => cHi += 1
          case _ => cOther += 1
        }
      }
      i += Character.charCount(cp)
    }
    val best = math.max(math.max(math.max(cZh, cJa), math.max(cKo, cRu)), math.max(cAr, cHi))
    if (best == 0 || best <= cOther) null
    else if (best == cZh) zh
    else if (best == cJa) ja
    else if (best == cKo) ko
    else if (best == cRu) ru
    else if (best == cAr) ar
    else hi
  }

  private val space = UTF8String.fromString(" ")

  /** Per-document n-gram repetition statistics over a token array, one
    * linear pass per n (Gopher §A.1.1 signals). Counts 1/2/3-gram
    * multiplicities in open hash maps INSIDE the row — the whole
    * per-(doc, n, gram) count table the groupBy formulation shuffled
    * (~3 rows per token, corpus-wide) never leaves the task. Grams are
    * the exact strings `concat_ws(" ", slice(toks, i, n))` produced, so
    * results are value-identical to the SQL replay the q46 oracle runs.
    *
    * Returns `[tokens, nd1, nd2, top2, nd3, top3]` (distinct counts per
    * n; modal counts for n = 2, 3); `total_n = max(0, tokens - n + 1)`
    * is derived by the caller. */
  final def repetitionStats(arr: ArrayData): InternalRow = {
    val t = arr.numElements()
    val m1 = new java.util.HashMap[UTF8String, Int]()
    var i = 0
    while (i < t) {
      m1.merge(arr.getUTF8String(i), 1, (a: Int, b: Int) => a + b)
      i += 1
    }
    var nd2 = 0L
    var top2 = 0L
    var nd3 = 0L
    var top3 = 0L
    var n = 2
    while (n <= 3) {
      val m = new java.util.HashMap[UTF8String, Int]()
      var top = 0
      i = 0
      while (i <= t - n) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
        val c = m.merge(UTF8String.concatWs(space, parts: _*), 1, (a: Int, b: Int) => a + b)
        if (c > top) top = c
        i += 1
      }
      if (n == 2) { nd2 = m.size.toLong; top2 = top.toLong }
      else { nd3 = m.size.toLong; top3 = top.toLong }
      n += 1
    }
    new GenericInternalRow(Array[Any](t.toLong, m1.size.toLong, nd2, top2, nd3, top3))
  }

  /** Per-document word n-gram frequencies in one in-row pass:
    * `[(gram, tf)]` with grams space-joined — [[termCounts]] generalized
    * to n > 1. The higher-order-function formulation this replaces
    * (`transform(sequence(...), i -> concat_ws(' ', slice(toks, i, n)))`)
    * allocates a sliced copy per position per row in the interpreter and
    * measured ~8x slower at 1M docs; here each gram is one
    * `UTF8String.concatWs` inside the task and the count table never
    * leaves the row. */
  final def ngramCounts(arr: ArrayData, n: Int): ArrayData = {
    val t = arr.numElements()
    val m = new java.util.LinkedHashMap[UTF8String, Int]()
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i + n <= t) {
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      m.merge(UTF8String.concatWs(space, parts: _*), 1, (a: Int, b: Int) => a + b)
      i += 1
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = new GenericInternalRow(Array[Any](e.getKey, e.getValue.toLong))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Per-document term frequencies in one in-row pass:
    * `[(term, tf)]` entries (order unspecified — feeds aggregations).
    * Replaces a corpus-wide groupBy(doc, term) whose shuffle carried one
    * row per token; the count table never leaves the task. */
  final def termCounts(arr: ArrayData): ArrayData = {
    val t = arr.numElements()
    val m = new java.util.LinkedHashMap[UTF8String, Int]()
    var i = 0
    while (i < t) {
      m.merge(arr.getUTF8String(i), 1, (a: Int, b: Int) => a + b)
      i += 1
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = new GenericInternalRow(Array[Any](e.getKey, e.getValue.toLong))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `script_vote(text)` — see [[TextKernels.scriptVote]]; null for
  * Latin-dominant or letterless text. */
case class ScriptVote(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "script_vote"

  override def nullSafeEval(input: Any): Any =
    TextKernels.scriptVote(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |${ev.value} = graft.functions.TextKernels.scriptVote($a);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `repetition_stats(tokens)` — see [[TextKernels.repetitionStats]]. A
  * single static call inside whole-stage codegen; the per-gram count
  * tables live and die inside the row. */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType, containsNull = false))
  override def dataType: DataType = StructType(Seq(
    StructField("tokens", LongType, nullable = false),
    StructField("nd1", LongType, nullable = false),
    StructField("nd2", LongType, nullable = false),
    StructField("top2", LongType, nullable = false),
    StructField("nd3", LongType, nullable = false),
    StructField("top3", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any =
    TextKernels.repetitionStats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.repetitionStats($a);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `ngram_counts(tokens, n)` — see [[TextKernels.ngramCounts]]. */
case class NgramCounts(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"ngram length must be >= 1, got $n")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType, containsNull = false))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ngram_counts"

  override def nullSafeEval(input: Any): Any =
    TextKernels.ngramCounts(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.ngramCounts($a, $n);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `term_counts(tokens)` — see [[TextKernels.termCounts]]. */
case class TermCounts(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType, containsNull = false))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "term_counts"

  override def nullSafeEval(input: Any): Any =
    TextKernels.termCounts(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.termCounts($a);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `normalize_text(text)` — canonical text normalization before content
  * hashing / exact dedup (the CCNet-style preprocessing step): Unicode
  * NFC, diacritic strip (NFD → drop combining marks → NFC), lowercase,
  * ASCII-whitespace-run collapse to a single space, trim. Matches DuckDB
  * `trim(regexp_replace(lower(strip_accents(nfc_normalize(text))),
  * '\s+', ' ', 'g'))` on BMP text without special casefolding, which is
  * what the q80 oracle replays. Static-call codegen, no row boxing. */
case class NormalizeText(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "normalize_text"

  override def nullSafeEval(input: Any): Any =
    TextKernels.normalizeText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.normalizeText($a);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `span_corrupt(tokens, seed)` — T5-style span corruption
  * (Raffel et al. JMLR'20 §3.1.4): deterministic pseudo-random spans
  * replaced by `<extra_id_k>` sentinels in the input; the target carries
  * each sentinel followed by the tokens it hides, so
  * input ⋈ target reconstructs the original sequence exactly. The
  * per-row `seed` (the doc id) keys every decision — same doc, same
  * corruption, any partitioning. Static-call codegen.
  *
  * `startPermille` is the per-token span-start probability ×1000;
  * expected masked fraction ≈ startPermille/1000 · meanSpan. */
case class SpanCorrupt(
    left: Expression,
    right: Expression,
    startPermille: Int,
    meanSpan: Int) extends BinaryExpression with ImplicitCastInputTypes {
  require(startPermille > 0 && startPermille <= 1000 && meanSpan >= 1, "bad corruption params")

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType, containsNull = false), LongType)
  override def dataType: DataType = StructType(Seq(
    StructField("input", StringType, nullable = false),
    StructField("target", StringType, nullable = false),
    StructField("n_masked", LongType, nullable = false),
    StructField("n_spans", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "span_corrupt"

  override def nullSafeEval(toks: Any, seed: Any): Any =
    TextKernels.spanCorrupt(toks.asInstanceOf[ArrayData],
      seed.asInstanceOf[Long], startPermille, meanSpan)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, sd) =>
      s"${ev.value} = graft.functions.TextKernels.spanCorrupt($t, $sd, $startPermille, $meanSpan);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
