package graft.streaming

import graft.sources.ZStore
import org.apache.spark.sql.DataFrame

/** Streaming ingest into a [[graft.sources.ZStore]] — the Z-order
  * layout's lifecycle composed with Structured Streaming the way
  * [[IngestPipeline]] composes the versioned corpus store: documents
  * arrive as micro-batches, each batch lands as an O(batch) absorb
  * (one new curve-bucket-local file per touched bucket, old files
  * shared), and the PERSISTED maintenance advice
  * ([[graft.sources.ZStore.advice]]) decides what housekeeping runs
  * inline.
  *
  * The division of labor follows the tree's measured serving lesson
  * (the round-17 maintain-inside-CascadeServe probe): work whose cost
  * is bounded by the STREAM (absorb ∝ batch; compaction ∝ dirty
  * buckets, which only the stream's own absorbs dirty) runs inline in
  * the batch function — a fold only triggers once a bucket crosses
  * `maxFilesPerBucket`, so its amortized cost per batch is one
  * rewrite of the rows the stream itself added. Work whose cost is
  * bounded by the TABLE (relayout — a full re-derive + rewrite when
  * the stamped envelopes no longer cover the stream) does NOT run
  * inline by default: a 100 TB rewrite inside a micro-batch stalls
  * the stream for its whole duration, which is exactly why the
  * cascade serving stream treats retrain as a separate job. The
  * relayout SIGNAL is durable (clamp counters ride every manifest),
  * so an offline scheduler polls `ZStore.advice(root)` and runs
  * [[graft.sources.ZStore.relayout]] between batches; `relayoutInline`
  * opts small stores into doing it in-stream.
  *
  * `keepVersions` self-prunes after each commit (every absorb is a
  * new manifest version — a long stream would otherwise accumulate
  * one tiny version per batch). Inside the sink, prune strictly
  * alternates with publishes, so the build-vs-prune exclusion the
  * store documents holds by construction — the same race-free-by-
  * sequencing argument as the rebalance loop's self-pruning.
  */
object ZIngest {

  /** foreachBatch body. An empty/replayed batch publishes nothing (no
    * version churn). Batches must match the store's stamped (name,
    * type) schema — the absorb gate refuses drift loudly, failing the
    * stream rather than poisoning the pool. */
  def absorbingSink(root: String, maxFilesPerBucket: Int = 8,
                    clampFloor: Double = 0.05, minAbsorbed: Long = 10000L,
                    keepVersions: Int = 2, relayoutInline: Boolean = false)
                   (batch: DataFrame, batchId: Long): Unit = {
    require(keepVersions >= 0,
      s"keepVersions $keepVersions must be >= 0 (0 = never prune)")
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    val r = ZStore.absorb(spark, root, batch)
    if (r.rowsAbsorbed == 0L) return
    val ad = ZStore.advice(spark, root, maxFilesPerBucket, clampFloor,
      minAbsorbed)
    ad.action match {
      case "maintain" =>
        ZStore.maintain(spark, root, maxFilesPerBucket)
      case "relayout" if relayoutInline =>
        ZStore.relayout(spark, root)
      case _ => () // healthy, or relayout left to the offline scheduler
    }
    if (keepVersions >= 1) ZStore.prune(spark, root, keepVersions)
  }
}
