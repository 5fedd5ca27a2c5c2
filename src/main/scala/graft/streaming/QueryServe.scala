package graft.streaming

import graft.functions.VectorFunctions
import graft.operators.TopK
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Online kNN serving as Structured Streaming (north-star claim:
  * "online ANN serving requires specialized infrastructure" — on
  * Spark it is a micro-batch stream-static join).
  *
  * Queries arrive as a stream `(query_id, ts, qvec)`; the corpus is a
  * STATIC DataFrame (the loaded vector index — re-read per micro-batch
  * from its store, so index upserts from
  * [[EventStream.upsertBatch]] become visible without restart).
  * Stream-static joins need no state store; the per-query top-k is the
  * bounded [[TopK]] aggregation keyed by (query, event-time window),
  * so the watermark bounds aggregation state and emits each query's
  * result once its window closes (append mode).
  */
object QueryServe {

  /** `queries`: streaming DF with `qidCol`, `tsCol`, `qvecCol`.
    * Returns a streaming DF `(window, qid, topk: array<struct<dist,id>>)`
    * writable in append mode. */
  def serve(queries: DataFrame, corpus: DataFrame,
            embCol: String, idCol: String,
            qidCol: String, tsCol: String, qvecCol: String,
            k: Int, watermark: String = "1 minute",
            windowLen: String = "1 minute"): DataFrame =
    queries
      .withWatermark(tsCol, watermark)
      .join(corpus) // stream-static cross join: corpus scan per batch
      .select(col(qidCol), col(tsCol),
        VectorFunctions.l2(col(embCol), col(qvecCol)).as("__dist"),
        col(idCol).cast("long").as("__id"))
      .groupBy(window(col(tsCol), windowLen).as("w"), col(qidCol))
      .agg(TopK.topK(k)(col("__dist"), col("__id")).as("topk"))
      .select(col("w.start").as("w_start"), col(qidCol), col("topk"))
}
