package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Sign-LSH bucket ids for ALL hash tables in one pass: vector →
  * array<long> of `numTables` bucket ids, bit j of table t =
  * sign(Σ_i v_i · s(i, t·numPlanes+j)) with ±1 Rademacher entries derived
  * from a seeded SplitMix64 parity (angle-preserving by CLT — the
  * standard random-projection family).
  *
  * A native expression because the per-row work is
  * numTables·numPlanes·dim multiply-adds over a sign matrix that only
  * depends on (dim, planes, tables, seed): precomputed once per
  * executor, then a tight triple loop with zero allocation beyond the
  * output array. The HOF equivalent re-derives every sign via an
  * interpreted per-element lambda (measured ~10× slower, r2
  * in-session), and gaussian
  * literal planes bake dim·planes·tables constants into the plan. */
/** cosine(a, b) as a native expression: one fused loop accumulating dot
  * product and both norms (left-to-right, same order as the
  * `aggregate`-HOF formulation, so results are bit-identical to it).
  * NULL or zero-norm input → NULL. The HOF version walks the arrays three
  * times through interpreted lambdas; the scored-pairs stage of a
  * similarity join evaluates this once per candidate pair, so it is hot.
  *
  * Codegen (r15): emits the same fused loop through `doGenCode` instead
  * of CodegenFallback — fallback didn't just interpret THIS node, it
  * broke whole-stage codegen for the entire scored-pairs stage, which
  * is exactly the |X|·|Y| hot path (sf1 measured ~12µs/pair through
  * the fallback; the generated loop is the identical operation order,
  * so values are bit-equal). */
case class CosineSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  // zero-norm input → NULL regardless of children's nullability (the
  // Divide convention). Without this, non-nullable array children make
  // nullSafeCodeGen render `ev.isNull` as the literal `false` and the
  // generated `false = true;` is a Java compile error — which silently
  // drops the whole stage back to interpreted execution.
  override def nullable: Boolean = true

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires array<float|double>, got ${left.dataType.simpleString}, ${right.dataType.simpleString}")

  // lazy: reading child.dataType on an unresolved child must surface as a
  // TypeCheckFailure at analysis, not an UnresolvedException at construction
  private lazy val leftFloat = left.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }
  private lazy val rightFloat = right.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val dn = ctx.freshName("denom")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val getX = if (leftFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (rightFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $getX;
         |  double $y = $getY;
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |double $dn = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |if ($dn == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / $dn;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

case class CosineLshBuckets(child: Expression, numPlanes: Int, numTables: Int,
    seed: Long) extends UnaryExpression with UnaryKernelCodegen {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cosine_lsh_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cosine_lsh_buckets requires array<float|double>, got ${other.simpleString}")
  }

  // lazy for the same unresolved-children reason as CosineSim's flags
  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // sign matrix rows = numTables*numPlanes hyperplanes, cols = dim;
  // materialized lazily at first eval (dim comes from the data) and
  // cached per (expression instance = per task closure) — deterministic
  // in (seed, plane, component), so every executor derives the same one.
  @transient private var signs: Array[Byte] = _
  @transient private var signDim: Int = -1

  private def signMatrix(dim: Int): Array[Byte] = {
    if (signDim != dim) {
      val planes = numTables * numPlanes
      val m = new Array[Byte](planes * dim)
      var p = 0
      while (p < planes) {
        var i = 0
        while (i < dim) {
          val h = MinHashSig.mix64(seed ^ (p.toLong * 0x9e3779b97f4a7c15L + i + 1))
          m(p * dim + i) = if ((h & 1L) == 0L) 1 else -1
          i += 1
        }
        p += 1
      }
      signs = m
      signDim = dim
    }
    signs
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      v(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    val m = signMatrix(dim)
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0L
      var j = 0
      while (j < numPlanes) {
        val base = (t * numPlanes + j) * dim
        var acc = 0.0
        var k = 0
        while (k < dim) {
          acc += v(k) * m(base + k)
          k += 1
        }
        if (acc > 0) bucket |= (1L << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CosineLshBuckets =
    copy(child = newChild)
}
