package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native in-scan expression: canonical/
  * compatibility normalization (NFC/NFD/NFKC/NFKD) with optional
  * accent stripping (NFD-decompose, drop non-spacing combining marks,
  * re-compose) and case folding — THE canonicalization step before any
  * text dedup or fuzzy match: "Café" typed with a combining acute and
  * with a precomposed é are DIFFERENT byte strings that every hash-
  * based operator in this library would treat as distinct documents
  * until normalized.
  *
  * Pure JDK (`java.text.Normalizer`, Unicode standard annex #15) —
  * per-row kernel, no shuffle, composes with every text operator
  * upstream of their tokenization. */
case class NormalizeText(child: Expression, form: String,
    stripAccents: Boolean, caseFold: Boolean)
    extends UnaryExpression with UnaryKernelCodegen {

  require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"form must be one of NFC/NFD/NFKC/NFKD, got $form")

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"normalize_text requires string, got ${other.simpleString}")
  }

  @transient private lazy val normForm = Normalizer.Form.valueOf(form)

  override def nullSafeEval(input: Any): Any = {
    var s = Normalizer.normalize(input.asInstanceOf[UTF8String].toString, normForm)
    if (stripAccents) {
      val decomposed = Normalizer.normalize(s, Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(decomposed.length)
      var i = 0
      while (i < decomposed.length) {
        val c = decomposed.charAt(i)
        if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
        i += 1
      }
      // re-compose so unaffected sequences return to the requested form
      s = Normalizer.normalize(sb.toString, normForm)
    }
    if (caseFold) s = s.toLowerCase(java.util.Locale.ROOT)
    UTF8String.fromString(s)
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}
