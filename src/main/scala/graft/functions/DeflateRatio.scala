package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE compression ratio of a string's UTF-8 bytes:
  * `compressed_len / raw_len` — the compressibility quality gate of
  * web-corpus curation (Gopher/RefinedWeb reject documents that
  * compress too well — boilerplate, degenerate repeats — or too badly
  * — encoded binary noise). [[TextFunctions.charEntropy]] approximates
  * the same signal from the order-0 char distribution; DEFLATE also
  * sees REPEATED STRUCTURE (LZ77 matches), which entropy cannot:
  * `"abcdefgh" * 100` has maximal char entropy but near-zero ratio.
  *
  * raw DEFLATE (nowrap, no zlib header) at `level`, so short strings
  * are not dominated by container overhead. Empty input → 1.0
  * (vacuously incompressible). One `Deflater` is allocated per
  * expression instance per task and `reset()` between rows — no
  * per-row native-object churn in the scan loop.
  *
  * In-scan, no shuffle; evaluation is a per-row native-JVM kernel like
  * the codec expressions ([[PngPixelStats]] etc.). Not expressible as
  * Column algebra or a SQL oracle — verified by spec against known
  * compressibility orderings and the java.util.zip reference round
  * trip. */
case class DeflateRatio(child: Expression, level: Int)
    extends UnaryExpression with UnaryKernelCodegen {

  require(level >= 1 && level <= 9, s"deflate level must be in 1..9, got $level")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio requires string, got ${other.simpleString}")
  }

  // one per task (expressions are serialized per-task); reset() between
  // rows. Not thread-safe across rows of DIFFERENT tasks — each task
  // deserializes its own copy, so this is per-thread by construction.
  @transient private lazy val deflater = new Deflater(level, /*nowrap=*/ true)
  @transient private lazy val buf = new Array[Byte](64 * 1024)

  override def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String].getBytes
    if (raw.isEmpty) return 1.0
    val d = deflater
    d.reset()
    d.setInput(raw)
    d.finish()
    var compressed = 0L
    while (!d.finished()) compressed += d.deflate(buf)
    compressed.toDouble / raw.length
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}
