package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-tailed join keys.
  *
  * AQE's skew-join splitting handles most cases at runtime; explicit
  * salting remains the tool when one reducer's key is hot beyond what
  * partition-splitting fixes (or when AQE is unavailable, e.g. inside
  * some streaming joins). The hot side's rows get a per-row salt in
  * [0, saltFactor), the other side is replicated saltFactor times, and
  * the join key becomes (key, salt) — a key that previously landed on
  * one reducer now spreads across saltFactor of them.
  *
  * Cost model: replicates the SMALLER side saltFactor× (size it like a
  * broadcast decision), leaves the large side untouched beyond an extra
  * tiny salt column.
  */
object Skew {

  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    // join types that emit unmatched rows of the REPLICATED side would
    // emit each such row saltFactor times — reject them
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "cross", "left", "leftouter", "leftsemi", "leftanti").contains(jt),
      s"saltedJoin replicates the right side; joinType '$joinType' would emit " +
        "unmatched right rows saltFactor times (use inner/left-preserving types)")
    // per-row deterministic-at-runtime spread; the salt only routes rows
    // to reducers, so its exact values never affect results
    val salted = skewed.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).cast("int"))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
