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

  /** V3: filtered kNN — predicate composes BEFORE top-k, so the filter
    * is pushed into the scan and top-k is exact over survivors (no
    * k·3 over-fetch hack needed — /root/reference/main.py:160-165). */
  def filtered(corpus: DataFrame, embCol: String, idCol: String,
               predicate: Column, queryVec: Column, k: Int): DataFrame =
    exact(corpus.filter(predicate), embCol, idCol, queryVec, k)

  /** V2: batch kNN — top-k per query over queries × corpus.
    * `queries(qid, qvec)` is broadcast; corpus stays put. */
  def batch(corpus: DataFrame, embCol: String, idCol: String,
            queries: DataFrame, qidCol: String, qvecCol: String,
            k: Int, metric: String = "l2"): DataFrame = {
    val dist = metric match {
      case "l2"     => VectorFunctions.l2(col(embCol), col(qvecCol))
      case "cosine" => -VectorFunctions.cosine(col(embCol), col(qvecCol))
      case m        => throw new IllegalArgumentException(s"metric $m")
    }
    val joined = corpus.crossJoin(broadcast(queries))
      .withColumn("dist", dist)
    val w = Window.partitionBy(col(qidCol)).orderBy(col("dist"), col(idCol))
    joined.withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= k)
  }
}
