package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval-quality metrics for an approximate index against exact
  * ground truth — the evaluation harness that decides whether an ANN
  * configuration (IVF nprobe, PQ candMult, LSH tables) is trustworthy
  * before it serves at corpus scale. Generalizes the v9 recall check
  * to the standard IR triple: recall@k, MRR@k, nDCG@k (binary
  * relevance = membership in the exact top-k; both engines share the
  * (dist, id) total order, so ground truth is deterministic).
  *
  * Scale shape: both inputs are k-bounded per query by construction
  * (they come out of top-k operators), so the relevance join carries
  * ≤ 2k rows per query and the per-query aggregate is a |queries|-row
  * groupBy — nothing here touches the corpus. IDCG is a Scala
  * constant (binary relevance, |truth| = k), computed with the same
  * ln(r+1)/ln(2) arithmetic the oracle uses so the 6-dp rounding can
  * never straddle an engine difference.
  */
object RetrievalEval {

  private def log2(c: Column): Column = log(c) / log(lit(2.0))

  /** Per-query metrics of `results` (columns: qidCol, idCol, rankCol
    * with ranks 1..k) against `truth` (qidCol, idCol — the exact
    * top-k). Returns one row per qid: recall_k, mrr_k, ndcg_k,
    * rounded at 6 dp.
    *
    * Coverage contract: rows are emitted per qid PRESENT IN
    * `results`. A query with zero result rows (e.g. every probed IVF
    * cell empty) gets NO row — its recall is 0, not absent — so a
    * caller averaging over a query sample must divide by the SAMPLE
    * size, not count the returned rows
    * ([[IndexMaintenance.maintain]] does exactly this for its commit
    * gate). */
  def metricsAtK(results: DataFrame, truth: DataFrame,
                 qidCol: String, idCol: String, rankCol: String,
                 k: Int): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    val idcg = (1 to k).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0))).sum
    results
      .join(truth.select(col(qidCol), col(idCol), lit(1).as("__rel")),
        Seq(qidCol, idCol), "left")
      .groupBy(qidCol)
      .agg(
        round(sum(coalesce(col("__rel"), lit(0))) / k.toDouble, 6)
          .as(s"recall_$k"),
        round(coalesce(
            max(when(col("__rel") === 1, lit(1.0) / col(rankCol))), lit(0.0)), 6)
          .as(s"mrr_$k"),
        round(sum(when(col("__rel") === 1, lit(1.0) / log2(col(rankCol) + 1))
            .otherwise(lit(0.0))) / idcg, 6)
          .as(s"ndcg_$k"))
  }
}
