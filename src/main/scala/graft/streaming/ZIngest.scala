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
  * `maxFilesPerBucket`, AND each call folds at most
  * `foldBucketsPerCall` of the dirtiest buckets, bounding ONE call's
  * rewrite. What the dial buys depends on the bucket count (measured
  * head-to-head at 30M under a uniform stream — every batch spans the
  * full value range, all buckets fragment in lockstep; PLANS.md round
  * 19): at 64 buckets a 16-bucket fold is already a quarter of the
  * store, so the worst batch only drops 13.5 → 12.0 s while the MEAN
  * rises 6.0 → 7.4 s (folding earlier folds the same rows more
  * often) — small stores under uniform streams can prefer
  * `Int.MaxValue`. The dial is for LARGE bucket counts, where an
  * unbounded fold on a uniform stream is a full-table stall (at
  * bucketBits=12 / 4096 buckets, the whole table in one micro-batch)
  * and a bounded fold is a fixed slice. The trade is a fragmentation
  * CEILING instead of a stall: deferred buckets keep growing until
  * their fold turn comes, to roughly maxFilesPerBucket +
  * nBuckets / foldBucketsPerCall files — a listing/open tax, never an
  * envelope-width (pruning) problem. Work whose cost is bounded by the TABLE
  * (relayout — a full re-derive + rewrite when the stamped envelopes
  * no longer cover the stream) does NOT run inline by default: a
  * 100 TB rewrite inside a micro-batch stalls the stream for its
  * whole duration, which is exactly why the cascade serving stream
  * treats retrain as a separate job. The relayout SIGNAL is durable
  * (clamp counters ride every manifest), so an offline scheduler
  * polls `ZStore.advice(root)` and runs
  * [[graft.sources.ZStore.relayout]] between batches — with the
  * advice's `equalDepth` rank-family recommendation — and while the
  * relayout is PENDING the sink still folds fragmentation (relayout
  * advice outranks maintain advice, so without the fallback a store
  * in sustained envelope drift would fragment unboundedly until the
  * scheduler gets to it); `relayoutInline` opts small stores into
  * doing the relayout in-stream.
  *
  * Exactly-once absorbs: foreachBatch is at-least-once, so the sink
  * hands Spark's `batchId` to [[graft.sources.ZStore.absorb]], which
  * persists the last absorbed id in the manifest and no-ops a replay
  * (a crash between the absorb's publish and the stream's checkpoint
  * commit re-delivers the batch; without the guard it would silently
  * duplicate rows).
  *
  * `keepVersions` self-prunes after each commit (every absorb is a
  * new manifest version — a long stream would otherwise accumulate
  * one tiny version per batch). Inside the sink, prune strictly
  * alternates with publishes, so the build-vs-prune exclusion the
  * store documents holds by construction — the same race-free-by-
  * sequencing argument as the rebalance loop's self-pruning.
  */
object ZIngest {

  /** foreachBatch body. An empty batch publishes nothing (no version
    * churn); a REPLAYED batch is skipped via the persisted batch id
    * (effectively-once absorbs). Batches must match the store's
    * stamped (name, type) schema — the absorb gate refuses drift
    * loudly, failing the stream rather than poisoning the pool. */
  def absorbingSink(root: String, maxFilesPerBucket: Int = 8,
                    clampFloor: Double = 0.05, minAbsorbed: Long = 10000L,
                    keepVersions: Int = 2, relayoutInline: Boolean = false,
                    foldBucketsPerCall: Int = 16, writeFanOut: Int = 1)
                   (batch: DataFrame, batchId: Long): Unit = {
    require(keepVersions >= 0,
      s"keepVersions $keepVersions must be >= 0 (0 = never prune)")
    require(foldBucketsPerCall >= 1,
      s"foldBucketsPerCall $foldBucketsPerCall must be >= 1")
    require(writeFanOut <= maxFilesPerBucket,
      s"writeFanOut $writeFanOut above maxFilesPerBucket " +
        s"$maxFilesPerBucket would re-trip the fold it just ran")
    val spark = batch.sparkSession
    // ONE emptiness/replay decision, inside absorb: the zero-row
    // report covers the empty batch (absorb's own isEmpty), the
    // replayed batch (persisted lastBatchId), and a filtered-out
    // batch alike — the sink adds no second limit-1 scan of its own
    val r = ZStore.absorb(spark, root, batch, batchId = Some(batchId))
    if (r.rowsAbsorbed == 0L) return
    housekeep(spark, root, maxFilesPerBucket, clampFloor, minAbsorbed,
      keepVersions, relayoutInline, foldBucketsPerCall, writeFanOut)
  }

  /** foreachBatch body for a stream of UPSERTS — the reference store's
    * semantic (`build_vectorstore.py:239`: re-delivered documents
    * replace their prior rows by id) over the Z-store: each micro-batch
    * lands via [[graft.sources.ZStore.upsert]] (old copies purged by
    * copy-on-write on exactly the curve buckets that hold them, new
    * rows ranked against the stamped envelopes), with the same
    * persisted-batchId replay guard, advice-driven housekeeping, and
    * retention as [[absorbingSink]]. Use this when the stream can
    * re-deliver or revise documents; use absorbingSink when rows are
    * append-only facts (it skips the per-batch locate scan — the
    * upsert path's price is one narrow (id, file-path) scan of the
    * store per micro-batch, which is exactly why a pure event stream
    * should not pay it).
    *
    * NULL-ID ROWS: upsert refuses a batch carrying a null id (null is
    * not a row identity — the old-copy purge joins on it), and because
    * the refusal throws BEFORE batchId advances, a single null-id row
    * re-fails the stream on every restart/replay. That loudness is
    * deliberate (a silently-appended null row would be unpurgeable
    * forever); the operator remedy is to screen the SOURCE, not the
    * sink: add `.filter(col(idCol).isNotNull)` (or an explicit keying
    * step) to the stream before this sink if the upstream can emit
    * keyless rows. ZStoreSpec pins the refusal. */
  def upsertingSink(root: String, idCol: String,
                    maxFilesPerBucket: Int = 8,
                    clampFloor: Double = 0.05, minAbsorbed: Long = 10000L,
                    keepVersions: Int = 2, relayoutInline: Boolean = false,
                    foldBucketsPerCall: Int = 16, writeFanOut: Int = 1)
                   (batch: DataFrame, batchId: Long): Unit = {
    require(keepVersions >= 0,
      s"keepVersions $keepVersions must be >= 0 (0 = never prune)")
    require(foldBucketsPerCall >= 1,
      s"foldBucketsPerCall $foldBucketsPerCall must be >= 1")
    require(writeFanOut <= maxFilesPerBucket,
      s"writeFanOut $writeFanOut above maxFilesPerBucket " +
        s"$maxFilesPerBucket would re-trip the fold it just ran")
    val spark = batch.sparkSession
    // upsert refuses empty batches loudly (there is no id set to
    // apply), so the sink screens emptiness here — one limit-1 scan,
    // the replayed-batch case is absorbed by the guard inside upsert
    if (batch.isEmpty) return
    val r = ZStore.upsert(spark, root, batch, idCol, Some(batchId))
    if (r.rowsUpserted == 0L) return // replay — nothing new published
    housekeep(spark, root, maxFilesPerBucket, clampFloor, minAbsorbed,
      keepVersions, relayoutInline, foldBucketsPerCall, writeFanOut)
  }

  /** The shared advice-driven housekeeping tail of both sinks — one
    * copy of the action dispatch, so the relayout-pending fold
    * fallback cannot drift between them. `writeFanOut` reaches both
    * the inline fold and the opt-in inline relayout — the fold over a
    * huge bucket is the same one-task-per-bucket straggler the dial
    * was measured on ([[graft.sources.ZStore.autoMaintain]]'s note). */
  private def housekeep(spark: org.apache.spark.sql.SparkSession,
                        root: String, maxFilesPerBucket: Int,
                        clampFloor: Double, minAbsorbed: Long,
                        keepVersions: Int, relayoutInline: Boolean,
                        foldBucketsPerCall: Int,
                        writeFanOut: Int): Unit = {
    val ad = ZStore.advice(spark, root, maxFilesPerBucket, clampFloor,
      minAbsorbed)
    ad.action match {
      case "maintain" =>
        ZStore.maintain(spark, root, maxFilesPerBucket, foldBucketsPerCall,
          writeFanOut)
      case "relayout" if relayoutInline =>
        // small-store opt-in; the advice names the rank family the
        // occupancy evidence recommends
        ZStore.relayout(spark, root, equalDepth = ad.equalDepth,
          writeFanOut = writeFanOut)
      case "relayout" if ad.fragmentedBuckets > 0 =>
        // relayout left to the offline scheduler — but relayout advice
        // OUTRANKS maintain advice, so a store in sustained envelope
        // drift would otherwise never compact inline and fragmentation
        // would grow without bound while the relayout is pending
        ZStore.maintain(spark, root, maxFilesPerBucket, foldBucketsPerCall,
          writeFanOut)
      case _ => () // healthy, or drifted-but-unfragmented
    }
    if (keepVersions >= 1) ZStore.prune(spark, root, keepVersions)
  }
}
