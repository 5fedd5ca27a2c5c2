package graft.streaming

import graft.operators.IncrementalAgg
import graft.sources.IndexStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming materialized-view maintenance: the q12 absorb loop
  * ([[graft.operators.IncrementalAgg]]) as a foreachBatch sink. Each
  * micro-batch aggregates ITS OWN rows into partial state (cost ∝
  * batch — one map-side-combinable pass) and merges with the last
  * committed state (|groups| rows); the merged state commits as a new
  * `_SUCCESS`-gated [[IndexStore]] version, so readers flip between
  * complete snapshots and a crashed write is invisible.
  *
  * Exactly-once absorb under at-least-once replay: foreachBatch can
  * REPLAY a batch after driver recovery, and a naive absorb would
  * double-count its rows into the running sums — silently, because
  * merged state looks plausible at any value. Every committed version
  * therefore stamps the batch id it absorbed (`__mv_batch_id`,
  * constant per version); the sink skips a batchId EQUAL to the
  * newest committed stamp. This is the ShardExport journal pattern
  * applied to aggregate state: the commit artifact itself records how
  * far the stream got, so recovery needs no side channel.
  *
  * A batchId BELOW the stamp is not a replay — Structured Streaming
  * replays only the last unacknowledged batch, and batch ids within
  * one checkpoint are monotone — it means a query with a FRESH
  * checkpoint (batch ids restarted at 0) was pointed at an EXISTING
  * state root. Silently ≤-skipping there would drop every early batch
  * of the new query as "already absorbed"; the sink fails loudly
  * instead, and the operator either restores the original checkpoint
  * or starts a fresh state root.
  *
  * An empty batch commits nothing — no version churn, and the stamp
  * stays behind; a later replay of it is ≤-skipped or harmlessly
  * re-absorbed as empty. Non-streaming callers can drive
  * [[absorbSink]] directly as a micro-batched backfill loop.
  */
object MvMaintain {

  private val StampCol = "__mv_batch_id"

  /** Batch id stamped on the newest committed state version; -1 when
    * no state has been committed yet. */
  def lastAbsorbedBatch(spark: SparkSession, root: String): Long =
    IndexStore.committedVersions(spark, root) match {
      case Nil => -1L
      case vs => IndexStore.load(spark, s"$root/v${vs.last}")
        .agg(coalesce(max(col(StampCol)), lit(-1L))).collect()(0).getLong(0)
    }

  /** foreachBatch body: absorb `batch` into the state under `root`
    * exactly once. Wire as
    * `.writeStream.foreachBatch(MvMaintain.absorbSink(root, keys, vals) _)`. */
  def absorbSink(root: String, keys: Seq[String], vals: Seq[String])
                (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val last = lastAbsorbedBatch(spark, root)
    if (batchId == last) return // replayed: absorbed
    require(batchId > last,
      s"MvMaintain: batchId $batchId is behind the committed stamp $last " +
        s"at $root — batch ids within one checkpoint are monotone and only " +
        "the last batch replays, so this state root was built by a " +
        "DIFFERENT streaming checkpoint (a fresh checkpoint restarts ids " +
        "at 0). Skipping would silently drop the new query's early " +
        "batches; restore the original checkpoint or use a fresh state root.")
    if (batch.isEmpty) return // nothing to absorb, no version churn
    val delta = IncrementalAgg.partials(batch, keys, vals)
    val merged = IndexStore.committedVersions(spark, root) match {
      case Nil => delta
      case vs => IncrementalAgg.merge(keys, vals, Seq(
        IndexStore.load(spark, s"$root/v${vs.last}").drop(StampCol), delta))
    }
    IndexStore.writeVersioned(merged.withColumn(StampCol, lit(batchId)), root)
  }

  /** Render the report (avg derived, stamp dropped) from the newest
    * committed state — what a dashboard reads between absorbs. Fails
    * loudly when no state exists yet. */
  def currentReport(spark: SparkSession, root: String, keys: Seq[String],
                    vals: Seq[String]): DataFrame =
    IncrementalAgg.render(keys, vals,
      IndexStore.loadCurrent(spark, root).drop(StampCol))
}
