package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
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
