package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{col, lit, xxhash64}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Byte-pair encoding (Sennrich, Haddow, Birch, "Neural Machine
  * Translation of Rare Words with Subword Units", ACL 2016) — the
  * tokenization real LLM pipelines budget by. Whitespace-pre-tokenized,
  * byte-level base alphabet (ids 0–255; merge i mints id 256+i), so any
  * input encodes without an unknown-token escape hatch.
  *
  * Why it matters here: packing, chunking and truncation operate on
  * token BUDGETS, and a whitespace count misprices them — "internationalization"
  * is 1 whitespace token but several subword tokens. Training a merge
  * table on the corpus itself makes the budget match how the downstream
  * tokenizer will actually see the data.
  *
  * Scale shape (the [[Pq.train]] protocol): training runs ONE bounded
  * distributed sampling job — content-hash ordered, partition-layout
  * independent — and the merge loop is local and deterministic (ties
  * break toward the lexicographically smallest pair). The learned table
  * is a few KB riding the expression closure; counting is in-scan, one
  * long per document leaves the scan. */
object Bpe {

  /** An ordered merge table: merge i joins `pairs(i)` into id 256+i.
    * Small by construction (numMerges entries). */
  final case class Merges(pairs: Vector[(Int, Int)]) extends Serializable {
    /** pair → merge priority (lower = earlier-learned = applied first). */
    @transient lazy val ranks: Map[(Int, Int), Int] = pairs.zipWithIndex.toMap
    def take(n: Int): Merges = Merges(pairs.take(n))
  }

  /** Learn `numMerges` merges from a bounded corpus sample (one
    * distributed job; same content-derived TakeOrdered bound as
    * [[Pq.collectSample]] and for the same reason — a bare limit on a
    * source-ordered corpus would learn one region's subwords). */
  def train(corpus: DataFrame, textCol: String, numMerges: Int,
      maxTrainRows: Int = 4096, seed: Long = 42L): Merges = {
    val texts = corpus.select(col(textCol))
      .where(col(textCol).isNotNull)
      .orderBy(xxhash64(col(textCol), lit(seed)))
      .limit(maxTrainRows)
      .collect().map(_.getString(0))
    trainLocal(texts, numMerges)
  }

  /** Persist a merge table as parquet (`rank`, `left`, `right`) — the
    * tokenizer artifact: train once on the reference corpus, then
    * count/pack/truncate EVERY later batch with the identical
    * vocabulary (token budgets that drift between runs are not
    * budgets). The table is numMerges rows — kilobytes. */
  def saveMerges(spark: org.apache.spark.sql.SparkSession, merges: Merges,
      path: String): Unit = {
    import spark.implicits._
    merges.pairs.zipWithIndex
      .map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[saveMerges]] artifact; rank order restores application
    * priority exactly, so the loaded tokenizer is byte-identical to
    * the trained one. */
  def loadMerges(spark: org.apache.spark.sql.SparkSession, path: String): Merges =
    Merges(spark.read.parquet(path)
      .orderBy("rank")
      .collect()
      .map(r => (r.getInt(1), r.getInt(2)))
      .toVector)

  /** The local, deterministic merge loop over an already-collected
    * sample: count whitespace-word frequencies once, then repeatedly
    * merge the most frequent adjacent id pair (ties toward the smallest
    * pair), stopping early when no pair repeats. */
  private[graft] def trainLocal(texts: Array[String], numMerges: Int): Merges = {
    require(numMerges >= 0, s"numMerges must be non-negative, got $numMerges")
    val wordFreq = scala.collection.mutable.HashMap.empty[Vector[Int], Long]
    texts.foreach { t =>
      t.trim.split("\\s+").foreach { w =>
        if (w.nonEmpty) {
          val ids = w.getBytes("UTF-8").map(b => (b & 0xff): Int).toVector
          wordFreq.update(ids, wordFreq.getOrElse(ids, 0L) + 1L)
        }
      }
    }
    var words = wordFreq.toArray
    val merges = Vector.newBuilder[(Int, Int)]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      val pairCount = scala.collection.mutable.HashMap.empty[(Int, Int), Long]
      words.foreach { case (w, f) =>
        var i = 0
        while (i + 1 < w.length) {
          val p = (w(i), w(i + 1))
          pairCount.update(p, pairCount.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      // a pair seen once buys nothing: merging it cannot shorten any
      // future encoding of the sample beyond that single site
      val candidates = pairCount.filter(_._2 >= 2)
      if (candidates.isEmpty) done = true
      else {
        val best = candidates.toArray.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val newId = 256 + m
        words = words.map { case (w, f) => (mergeAll(w, best, newId), f) }
        m += 1
      }
    }
    Merges(merges.result())
  }

  private def mergeAll(w: Vector[Int], p: (Int, Int), newId: Int): Vector[Int] = {
    val out = Vector.newBuilder[Int]
    var i = 0
    while (i < w.length) {
      if (i + 1 < w.length && w(i) == p._1 && w(i + 1) == p._2) { out += newId; i += 2 }
      else { out += w(i); i += 1 }
    }
    out.result()
  }

  /** Greedy encode of one word's UTF-8 bytes: repeatedly apply the
    * LOWEST-rank (earliest-learned) pair present — the standard BPE
    * inference loop, mirroring training order so learned merges compose
    * the way they were minted. */
  private[graft] def encodeWord(bytes: Array[Int], merges: Merges): Array[Int] = {
    var ids = bytes
    var changed = true
    while (changed && ids.length > 1) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i + 1 < ids.length) {
        val r = merges.ranks.getOrElse((ids(i), ids(i + 1)), Int.MaxValue)
        if (r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) changed = false
      else {
        val p = merges.pairs(bestRank)
        val newId = 256 + bestRank
        val out = new Array[Int](ids.length)
        var n = 0
        i = 0
        while (i < ids.length) {
          if (i + 1 < ids.length && ids(i) == p._1 && ids(i + 1) == p._2) {
            out(n) = newId; n += 1; i += 2
          } else { out(n) = ids(i); n += 1; i += 1 }
        }
        ids = java.util.Arrays.copyOf(out, n)
      }
    }
    ids
  }

  /** Expand a token id back to its byte string (merged ids recurse into
    * their pair) — the round-trip direction. */
  private[graft] def decodeToken(id: Int, merges: Merges,
      out: java.io.ByteArrayOutputStream): Unit =
    if (id < 256) out.write(id)
    else {
      val (a, b) = merges.pairs(id - 256)
      decodeToken(a, merges, out); decodeToken(b, merges, out)
    }

  /** text → array(bpe_token_count, roundtrip_ok 1/0): whitespace words
    * each BPE-encoded; roundtrip_ok verifies decode(encode(w)) gives the
    * word's bytes back for EVERY word (an off-by-one in the merge loop
    * breaks it loudly instead of silently miscounting). */
  def stats(text: Column, merges: Merges): Column = {
    import org.apache.spark.sql.GraftColumn
    GraftColumn(BpeStats(GraftColumn.expr(text), merges))
  }

  /** text → BPE token count (the packing/chunking budget column). */
  def tokenCount(text: Column, merges: Merges): Column = {
    import org.apache.spark.sql.functions.element_at
    element_at(stats(text, merges), 1)
  }
}

/** text × (closure-shipped merge table) → array(n_tokens, roundtrip_ok).
  * Native expression: the per-word merge loop over int arrays with a
  * shared rank map is per-row byte crunching, the [[PngCodec]] tier. */
case class BpeStats(child: Expression, merges: Bpe.Merges)
    extends UnaryExpression with UnaryKernelCodegen {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bpe_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_stats requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.toString
    var nTokens = 0L
    var ok = true
    text.trim.split("\\s+").foreach { w =>
      if (w.nonEmpty) {
        val bytes = w.getBytes("UTF-8").map(b => (b & 0xff): Int)
        val ids = Bpe.encodeWord(bytes, merges)
        nTokens += ids.length
        val bos = new java.io.ByteArrayOutputStream()
        ids.foreach(Bpe.decodeToken(_, merges, bos))
        if (!java.util.Arrays.equals(bos.toByteArray, w.getBytes("UTF-8"))) ok = false
      }
    }
    new GenericArrayData(Array(nTokens, if (ok) 1L else 0L))
  }

  override protected def withNewChildInternal(newChild: Expression): BpeStats =
    copy(child = newChild)
}
