package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Language-ID as a native expression — semantically IDENTICAL to
  * [[TextFunctions.langId]] (one lowered whitespace tokenization, per-
  * language stopword hits, per-character hits for single-char lists,
  * greatest-wins with alphabetical-first tie-break, "und" on zero) but in
  * one pass over the text instead of a filter/array_contains lambda pair
  * per language (~10× at corpus scale; the HOF version stays as the
  * composition-only reference implementation and the two are asserted
  * equal in tests). */
case class LangIdExpr(child: Expression, lists: Seq[(String, Seq[String])])
    extends UnaryExpression with UnaryKernelCodegen {

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lang_id requires string, got ${other.simpleString}")
  }

  // sorted language order = deterministic tie-break, same as the Column
  // version and the SQL oracle's CASE order
  @transient private lazy val ordered: Array[(String, Either[Set[String], Set[Char]])] =
    lists.sortBy(_._1).map { case (lang, words) =>
      if (words.forall(_.length == 1)) lang -> Right(words.map(_.head).toSet)
      else lang -> Left(words.toSet)
    }.toArray

  override def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String]
    val lowered = raw.toLowerCase.toString.trim
    val toks: Array[String] = if (lowered.isEmpty) Array.empty else lowered.split("\\s+")
    val original = raw.toString
    var best = 0
    var bestLang: String = null
    var i = 0
    while (i < ordered.length) {
      val (lang, spec) = ordered(i)
      val score = spec match {
        case Left(words) =>
          var n = 0; var t = 0
          while (t < toks.length) { if (words.contains(toks(t))) n += 1; t += 1 }
          n
        case Right(chars) =>
          var n = 0; var c = 0
          while (c < original.length) { if (chars.contains(original.charAt(c))) n += 1; c += 1 }
          n
      }
      // strictly-greater keeps the FIRST (alphabetical) language on ties
      if (score > best) { best = score; bestLang = lang }
      i += 1
    }
    UTF8String.fromString(if (best > 0) bestLang else "und")
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}
