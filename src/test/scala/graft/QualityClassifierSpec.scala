package graft

import graft.functions.QualityClassifier
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSuite {
  import spark.implicits._

  test("featureTokens: unigrams + joined bigrams, null/blank-safe") {
    val r = Seq("The quick  fox", "", "  ", null)
      .toDF("t")
      .select(QualityClassifier.featureTokens(col("t")).as("toks"))
      .collect().map(_.getSeq[String](0))
    assert(r(0) == Seq("the", "quick", "fox", "the_quick", "quick_fox"))
    assert(r(1).isEmpty && r(2).isEmpty && r(3).isEmpty)
    val uni = Seq("A b").toDF("t")
      .select(QualityClassifier.featureTokens(col("t"), bigrams = false).as("toks"))
      .head().getSeq[String](0)
    assert(uni == Seq("a", "b"))
    // a single token yields no bigram (not a (tok, null) collapse)
    val one = Seq("solo").toDF("t")
      .select(QualityClassifier.featureTokens(col("t")).as("toks"))
      .head().getSeq[String](0)
    assert(one == Seq("solo"))
  }

  test("train/score separates planted classes and filter keeps the right side") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).where(col("doc_id") < 400)
    // negatives: character-reversed text — deterministic gibberish whose
    // token set is (almost) disjoint from real words
    val labeled = docs.select(col("doc_id"), col("text"), lit(1.0).as("label"))
      .union(docs.select(col("doc_id") + 1000000L, reverse(col("text")), lit(0.0)))
    val isTrain = graft.ops.DataPrep.hashBucket(col("doc_id") % 1000000L, 1000) < 700
    val model = QualityClassifier.train(labeled.where(isTrain), "text", "label",
      numFeatures = 1 << 16, maxIter = 50)
    val held = model.score(labeled.where(!isTrain), "text")
    val agg = held.agg(
      count(lit(1)).as("n"),
      sum(when((col("quality_score") >= 0.5) === (col("label") === 1.0), 1L)
        .otherwise(0L)).as("n_correct"),
      min(when(col("label") === 1.0, col("quality_score"))).as("min_pos"),
      max(when(col("label") === 0.0, col("quality_score"))).as("max_neg")
    ).head()
    val n = agg.getLong(0)
    assert(n > 50, s"held-out too small: $n")
    val acc = agg.getLong(1).toDouble / n
    assert(acc >= 0.95, s"held-out accuracy $acc")
    // the planted margin should be wide, not borderline
    assert(agg.getDouble(2) > agg.getDouble(3),
      s"score ranges overlap: min_pos=${agg.getDouble(2)} max_neg=${agg.getDouble(3)}")

    val kept = model.filter(labeled.where(!isTrain), "text", 0.5)
    assert(kept.columns.toSeq == labeled.columns.toSeq) // no helper columns leak
    val keptLabels = kept.agg(
      sum(when(col("label") === 0.0, 1L).otherwise(0L))).head().getLong(0)
    val heldNeg = held.where(col("label") === 0.0).count()
    assert(keptLabels.toDouble / heldNeg <= 0.05,
      s"filter kept $keptLabels of $heldNeg negatives")
  }

  test("null text scores at the intercept, not an error") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).where(col("doc_id") < 100)
    val labeled = docs.select(col("text"), lit(1.0).as("label"))
      .union(docs.select(reverse(col("text")), lit(0.0)))
    val model = QualityClassifier.train(labeled, "text", "label",
      numFeatures = 1 << 14, maxIter = 20)
    val s = model.score(Seq(Option.empty[String]).toDF("text"), "text")
      .head().getDouble(1)
    assert(s >= 0.0 && s <= 1.0)
  }
}
