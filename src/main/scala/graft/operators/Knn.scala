package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** kNN / similarity search (SURVEY.md §2.5 V1-V3; north-star ANN).
  *
  * Exact paths are distance-expression + top-k: Spark plans
  * `orderBy(dist).limit(k)` as `TakeOrderedAndProject` — a per-partition
  * k-heap plus a k-merge on the driver, NOT a global sort. That is the
  * correct 100 TB plan for single-query kNN: one narrow scan, no
  * shuffle of the corpus, k rows move.
  *
  * Batch form broadcasts the (small) query side so the corpus never
  * shuffles; per-query top-k is a window over the replicated join.
  * The approximate scale path (LSH / IVF) lives in [[AnnIndex]].
  */
object Knn {

  /** V1: exact kNN of one query vector over a corpus.
    * Total order (dist, id) — ties never flip between engines. */
  def exact(corpus: DataFrame, embCol: String, idCol: String,
            queryVec: Column, k: Int): DataFrame =
    corpus
      .withColumn("dist", VectorFunctions.l2(col(embCol), queryVec))
      .orderBy(col("dist"), col(idCol))
      .limit(k)

  /** [[exact]] restricted to rows with a DEFINED distance: a null
    * distance (null embedding, null element, dim mismatch) is dropped
    * BEFORE the top-k cut, so every returned row is a real candidate
    * and k is not eaten by nulls (Spark's ascending sort is NULLS
    * FIRST, so [[exact]] ranks such rows at the top). This is the
    * candidate contract the cascade's batch forms enforce; the
    * single-query cascade uses this so `batch == per-query` holds on
    * corpora with null embeddings. */
  def exactDefined(corpus: DataFrame, embCol: String, idCol: String,
                   queryVec: Column, k: Int): DataFrame =
    corpus
      .withColumn("dist", VectorFunctions.l2(col(embCol), queryVec))
      .filter(col("dist").isNotNull)
      .orderBy(col("dist"), col(idCol))
      .limit(k)

  /** V3: filtered kNN — predicate composes BEFORE top-k, so the filter
    * is pushed into the scan and top-k is exact over survivors (no
    * k·3 over-fetch hack needed — /root/reference/main.py:160-165). */
  def filtered(corpus: DataFrame, embCol: String, idCol: String,
               predicate: Column, queryVec: Column, k: Int): DataFrame =
    exact(corpus.filter(predicate), embCol, idCol, queryVec, k)

  private def metricDist(metric: String, embCol: String, qvecCol: String): Column =
    metric match {
      case "l2"     => VectorFunctions.l2(col(embCol), col(qvecCol))
      case "cosine" => -VectorFunctions.cosine(col(embCol), col(qvecCol))
      case m        => throw new IllegalArgumentException(s"metric $m")
    }

  /** V2: batch kNN — top-k per query over queries × corpus.
    * `queries(qid, qvec)` is broadcast; corpus stays put. The window
    * rank shuffles every (query × corpus) pair; prefer [[batchAgg]]
    * when queries × corpus is large. */
  def batch(corpus: DataFrame, embCol: String, idCol: String,
            queries: DataFrame, qidCol: String, qvecCol: String,
            k: Int, metric: String = "l2"): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries))
      .withColumn("dist", metricDist(metric, embCol, qvecCol))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("dist"), col(idCol))
    joined.withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= k)
  }

  /** V2 at scale: same result as [[batch]], but per-query top-k runs
    * as a bounded [[TopK]] aggregation — partial heaps map-side, so
    * the exchange carries ≤k rows per (partition × query) instead of
    * the full replicated corpus. Same total order (dist, id). */
  def batchAgg(corpus: DataFrame, embCol: String, idCol: String,
               queries: DataFrame, qidCol: String, qvecCol: String,
               k: Int, metric: String = "l2"): DataFrame =
    corpus.crossJoin(broadcast(queries))
      .select(col(qidCol),
        metricDist(metric, embCol, qvecCol).as("__dist"),
        col(idCol).cast("long").as("__id"))
      .groupBy(qidCol)
      .agg(TopK.topK(k)(col("__dist"), col("__id")).as("__topk"))
      .select(col(qidCol), posexplode(col("__topk")).as(Seq("__pos", "__entry")))
      .select(col(qidCol), (col("__pos") + 1).cast("int").as("knn_rank"),
        col("__entry.id").as(idCol), col("__entry.dist").as("dist"))
}
