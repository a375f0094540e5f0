package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag (or drop) training documents that
  * share a long character n-gram with an evaluation set — the 13-gram
  * overlap protocol published in the GPT-3 / PaLM model reports. A
  * training corpus that contains eval text inflates benchmark scores;
  * this pass runs after dedup and before packing.
  *
  * Scale shape: the benchmark side is small by construction (eval sets
  * are thousands of docs), so its distinct gram-hash set broadcasts;
  * the corpus side explodes grams in-scan and LEFT SEMI joins against
  * the broadcast — the corpus never shuffles for the match, and only
  * matched ids (tiny) shuffle for the final distinct.
  */
object Decontam {

  /** Distinct ids of corpus docs sharing >= 1 character n-gram with any
    * benchmark doc. Grams are 64-bit hashes ([[CharShingleHashes]]) —
    * 8-byte join keys instead of 13-char strings; collisions (~1e-7 at
    * billions of grams) can only ADD a contaminated id, never miss one. */
  def contaminatedIds(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int = 13): DataFrame = {
    require(n > 0, "n-gram length must be positive")
    GraftFunctions.register(corpus.sparkSession)
    val benchGrams = bench
      .select(explode(GraftFunctions.charShingleHashes(col(textCol), n)).as("__g"))
      .distinct()
    corpus
      .select(col(idCol), explode(GraftFunctions.charShingleHashes(col(textCol), n)).as("__g"))
      .join(broadcast(benchGrams), Seq("__g"), "left_semi")
      .select(col(idCol)).distinct()
  }

  /** The corpus minus contaminated docs (LEFT ANTI on the flagged ids). */
  def dropContaminated(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int = 13): DataFrame =
    corpus.join(contaminatedIds(corpus, bench, idCol, textCol, n), Seq(idCol), "left_anti")
}
