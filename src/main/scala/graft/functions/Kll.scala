package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumn
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Mergeable per-group QUANTILE sketches (Apache DataSketches KLL —
  * Karnin, Lang & Liberty, FOCS 2016), the rank/percentile counterpart
  * of [[Sketches.distinctSketches]]'s HLL blobs.
  *
  * `approx_percentile` answers one question per scan; a persisted KLL
  * blob answers EVERY later quantile/rank question — per group, rolled
  * up, or across arbitrary group unions — by merging kilobyte sketches,
  * never rescanning history. At 100 TB that is the difference between
  * "what was the p99 last quarter, split by source" being a parquet read
  * of #groups × ~KB blobs versus a full-history scan per question.
  *
  * Implemented as a [[TypedImperativeAggregate]] (the same contract
  * Spark's own `hll_sketch_agg` uses): the live sketch object sits in
  * the aggregation buffer, partial aggregation works (map-side combine —
  * the exchange carries one compact blob per partition per group), and
  * serialization happens only at shuffle/spill boundaries, never per
  * row. Error is a RANK guarantee: k=200 gives ~1.65% normalized rank
  * error at 99% confidence, independent of the value distribution.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def prettyName: String = "kll_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_sketch_agg requires double, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    // nulls and NaNs are skipped (a NaN has no rank; letting it in would
    // poison every quantile of the group)
    if (v != null && !v.asInstanceOf[Double].isNaN)
      buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other); buf
  }

  /** Compact immutable image — the persistable artifact. */
  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** Union of KLL sketch BLOBS — the read/rollup side. Input rows are
  * serialized sketches (from [[KllSketchAgg]] or a previous merge);
  * the result is one merged blob. Deserializing each input blob once is
  * the contract's cost model: rows here are #groups-sized, not
  * corpus-sized. */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def prettyName: String = "kll_merge_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_merge_agg requires binary, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** Scalar read of a KLL blob: `array(quantile(q1), …, quantile(qn))`
  * under the INCLUSIVE (classic) rank convention. NULL for an empty
  * sketch (no rank exists) or an unreadable blob. A native expression
  * for the [[JpegDims]] reason: the blob's interior is a multi-level
  * compactor layout only the sketch library can walk. */
case class KllQuantiles(child: Expression, qs: Seq[Double])
    extends UnaryExpression with UnaryKernelCodegen {

  require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
    s"quantile ranks must be in [0,1], got $qs")

  override def prettyName: String = "kll_quantiles"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_quantiles requires binary, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val sk =
      try KllDoublesSketch.heapify(Memory.wrap(input.asInstanceOf[Array[Byte]]))
      catch { case _: Exception => null }
    if (sk == null || sk.isEmpty) null
    else new GenericArrayData(
      qs.map(q => sk.getQuantile(q, QuantileSearchCriteria.INCLUSIVE)).toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): KllQuantiles =
    copy(child = newChild)
}

/** Column-API builders. */
object Kll {

  /** Aggregate Column: KLL quantile sketch blob of `value`. */
  def sketchAgg(value: Column, k: Int = 200): Column =
    GraftColumn(KllSketchAgg(GraftColumn.expr(value.cast("double")), k)
      .toAggregateExpression())

  /** Aggregate Column: union of sketch blobs. `k` must be ≥ the blobs'
    * k for the error guarantee to carry through the merge. */
  def mergeAgg(sketch: Column, k: Int = 200): Column =
    GraftColumn(KllMergeAgg(GraftColumn.expr(sketch), k).toAggregateExpression())

  /** Scalar Column: quantile estimates read out of one blob. */
  def quantiles(sketch: Column, qs: Seq[Double]): Column =
    GraftColumn(KllQuantiles(GraftColumn.expr(sketch), qs))
}
