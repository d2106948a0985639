package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measured quality of the approximate operators — recall is the
  * currency of LSH / IVF / MinHash beyond exactness-of-the-approximation:
  * the hard oracles pin WHAT the approximation computes, these measure
  * HOW CLOSE it lands to the exact answer at the default knobs. Bench
  * emits them per round (BENCH/BASELINE.md recall table); PipelineSpec
  * floors them so a knob or hash-family regression that silently craters
  * quality fails the suite even while staying "correct".
  */
object Recall {

  /** Fraction of `exact`'s (query_id, nn_id) rows `approx` also returned
    * — mean recall@k over queries when both are top-k tables.
    */
  def topKRecall(approx: DataFrame, exact: DataFrame): Double = {
    val total = exact.count()
    require(total > 0, "empty exact top-k")
    val hits = exact.select(col("query_id"), col("nn_id"))
      .join(approx.select(col("query_id"), col("nn_id")),
        Seq("query_id", "nn_id"), "left_semi")
      .count()
    hits.toDouble / total
  }

  /** Ground-truth near-dup pairs (exact shingle-Jaccard ≥ tau) over the
    * FULL support of J > 0: every pair sharing ≥ 1 distinct k-shingle —
    * a pair sharing none has J = 0 and can never reach tau, so this is
    * exhaustive with no LSH shortcut. It is the denominator recall is
    * measured against; the shingle self-join is fine at bench SF, and at
    * 10^10 this is the definition one samples, not runs.
    */
  def exactNearDupPairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, tau: Double = 0.5): DataFrame = {
    val sh = docs.select(col(idCol).as("jid"),
      explode(Dedup.shingleSet(col(textCol), shingleK)).as("sh"))
    val support = sh.select(col("jid").as("id_a"), col("sh"))
      .join(sh.select(col("jid").as("id_b"), col("sh")), Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    Dedup.exactJaccard(docs, support, idCol, textCol, shingleK)
      .filter(col("jaccard") >= tau)
      .select("id_a", "id_b", "jaccard")
  }

  /** Pair recall of `found` vs `truth` on (id_a, id_b). */
  def pairRecall(found: DataFrame, truth: DataFrame): Double = {
    val total = truth.count()
    require(total > 0, "empty truth pair set")
    val hits = truth.select(col("id_a"), col("id_b"))
      .join(found.select(col("id_a"), col("id_b")),
        Seq("id_a", "id_b"), "left_semi")
      .count()
    hits.toDouble / total
  }
}
