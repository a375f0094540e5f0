package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType}

/** JPEG geometry from the header bytes, no codec: walk the marker
  * segments (JFIF/JPEG interchange format — public spec, ITU T.81 §B) to
  * the first SOFn frame header and read height/width straight out of it.
  * Returns array(width, height), or NULL when the input is not a JPEG or
  * carries no frame header (e.g. a truncated blob).
  *
  * A native expression because the segment walk advances by each
  * segment's own 2-byte length field — variable-offset iteration that
  * bounded Column algebra can't express without unrolling an arbitrary
  * segment-count guess (the PNG case, a FIXED offset read, stays pure
  * Column in Multimodal.pngWidth/pngHeight).
  */
case class JpegDims(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "jpeg_dims"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"jpeg_dims requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    JpegDims.parse(input.asInstanceOf[Array[Byte]]) match {
      case Some((w, h)) => new GenericArrayData(Array(w, h))
      case None => null
    }

  override protected def withNewChildInternal(newChild: Expression): JpegDims =
    copy(child = newChild)
}

object JpegDims {

  // SOF0..SOF15 carry frame geometry, except the non-frame markers that
  // share the 0xCn range: DHT (C4), JPG (C8), DAC (CC). T.81 Table B.1.
  private def isSof(m: Int): Boolean =
    m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC

  /** (width, height) of the first SOF frame header, or None. */
  def parse(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xFF || (b(1) & 0xff) != 0xD8) return None
    var o = 2
    while (o + 1 < b.length) {
      if ((b(o) & 0xff) != 0xFF) return None // lost sync: not a marker
      val m = b(o + 1) & 0xff
      if (m == 0xFF) o += 1 // fill byte before a marker
      else if (m == 0x01 || (m >= 0xD0 && m <= 0xD9)) o += 2 // standalone (TEM/RSTn/SOI/EOI)
      else if (o + 3 >= b.length) return None
      else {
        val len = ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
        if (len < 2) return None
        if (isSof(m)) {
          // payload: precision(1) height(2) width(2) ... — T.81 §B.2.2.
          // A declared segment length too short to CONTAIN the geometry
          // (len < 2 length bytes + 1 + 2 + 2) marks a corrupt header:
          // reading on would return bytes of the NEXT segment as w/h.
          if (len < 7 || o + 9 > b.length) return None
          val h = ((b(o + 5) & 0xff) << 8) | (b(o + 6) & 0xff)
          val w = ((b(o + 7) & 0xff) << 8) | (b(o + 8) & 0xff)
          return Some((w, h))
        }
        if (m == 0xDA) return None // start of scan: entropy data follows, no SOF seen
        o += 2 + len
      }
    }
    None
  }
}
