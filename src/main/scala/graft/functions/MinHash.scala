package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** MinHash signature (Broder 1997) of a shingle set as a native Catalyst
  * `Expression`: array<string> shingles → array<long> of `numHashes`
  * per-seed minima, where Pr[sig_j(A)=sig_j(B)] = jaccard(A,B).
  *
  * One tight loop per row: each shingle's bytes are hashed ONCE, then the
  * n per-seed values derive from that 8-byte hash via a 5-op mix —
  * |sh| string hashes + |sh|·n mixes, zero allocation beyond the output
  * array. The equivalent higher-order-function composition
  * (`aggregate` + `zip_with`) allocates an n-element array per shingle
  * per row and evaluates interpreted lambdas — measured ~20× slower at
  * sf0.1 (r2 in-session; the round-1 nested-transform version was ~250×
  * slower). This is
  * the "custom Expression beats composition" case from the design
  * preference order.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with UnaryKernelCodegen {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType | LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string> (raw shingles) or array<bigint> " +
        s"(pre-hashed shingles), got ${other.simpleString}")
  }

  // lazy: constructing with an unresolved child must not throw here — the
  // type error belongs to checkInputDataTypes at analysis time
  private lazy val preHashed = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val seeds = MinHashSig.seeds(numHashes)
    var t = 0
    val n = arr.numElements()
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val h = if (preHashed) arr.getLong(t) else SimHash64.hash64(arr.getUTF8String(t))
        var j = 0
        while (j < numHashes) {
          val v = MinHashSig.mix64(h ^ seeds(j))
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      t += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** SORTED DISTINCT 64-bit hashes of a string's character k-grams — the
  * featurization kernel shared by the Jaccard and MinHash dedup paths.
  * Gram positions replicate the Column-DSL formulation exactly
  * (`substring(c, i+1, k)` for i in [0, max(len-k, 0)], so a short
  * string yields one truncated gram), and hashing a DISTINCT gram set
  * preserves set cardinalities (64-bit collisions negligible).
  *
  * One pass, one allocation: the HOF chain (sequence → substring
  * transform → array_distinct → xxhash transform → sort_array)
  * materializes four intermediate arrays of boxed values per row and
  * dominated both dedup featurize stages. */
case class CharShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with UnaryKernelCodegen {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_shingle_hashes requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val len = s.numChars()
    val n = math.max(len - k, 0) + 1
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      hashes(i) = SimHash64.hash64(s.substringSQL(i + 1, k))
      i += 1
    }
    java.util.Arrays.sort(hashes)
    // dedupe in place on the sorted array
    var out = 0
    var j = 0
    while (j < n) {
      if (j == 0 || hashes(j) != hashes(j - 1)) { hashes(out) = hashes(j); out += 1 }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hashes, out))
  }

  override protected def withNewChildInternal(newChild: Expression): CharShingleHashes =
    copy(child = newChild)
}

/** Number of agreeing components of two minhash signatures — the numerator
  * of the jaccard estimate. Tight loop over two long arrays; the HOF
  * equivalent (`zip_with` + `aggregate`) pays interpreted-lambda overhead
  * per component on every candidate pair. */
case class MinHashAgree(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with BinaryKernelCodegen {

  override def dataType: DataType = LongType
  override def prettyName: String = "minhash_agree"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"minhash_agree requires two array<bigint>, got ${l.simpleString}, ${r.simpleString}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var agree = 0L
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) agree += 1L
      i += 1
    }
    agree
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashAgree =
    copy(left = newLeft, right = newRight)
}

/** |A∩B| of two SORTED long arrays via a linear merge — the verification
  * kernel of the exact set-similarity join. Two sorted-array cursors and
  * long compares only; `array_intersect` on string arrays builds a hash
  * set of UTF8Strings per row pair (~10× the cost at typical shingle-set
  * sizes). Inputs must be deduplicated and ascending (sort_array over
  * array_distinct hashes). */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with BinaryKernelCodegen {

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count requires two array<bigint>, got ${l.simpleString}, ${r.simpleString}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var n = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { n += 1L; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object MinHashSig {
  /** fmix64 finalizer (MurmurHash3 / SplitMix64 public constants) — full
    * avalanche, so per-seed minima are independent uniform hashes. */
  def mix64(x0: Long): Long = {
    var x = x0
    x ^= (x >>> 33); x *= 0xff51afd7ed558ccdL
    x ^= (x >>> 33); x *= 0xc4ceb9fe1a85ec53L
    x ^= (x >>> 33)
    x
  }

  /** Deterministic per-seed salts via SplitMix64 over the seed index. */
  private val cache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  def seeds(n: Int): Array[Long] =
    cache.computeIfAbsent(n, _ => Array.tabulate(n)(j => mix64(0x9e3779b97f4a7c15L * (j + 1))))
}
