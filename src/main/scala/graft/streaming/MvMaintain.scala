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
  * constant per version) AND the identity of the batch-id sequence it
  * belongs to (`__mv_ckpt_id` — the caller's checkpoint location, the
  * thing that OWNS a monotone batch-id counter). The sink skips a
  * batchId equal to the newest committed stamp from the SAME
  * checkpoint. This is the ShardExport journal pattern applied to
  * aggregate state: the commit artifact itself records how far which
  * stream got, so recovery needs no side channel.
  *
  * Why the identity stamp: batch ids are only meaningful WITHIN one
  * checkpoint. A query started with a FRESH checkpoint against an
  * existing state root restarts ids at 0 — comparing its ids against
  * another checkpoint's stamp can silently drop batches in two ways:
  * a below-stamp id ≤-skipped as "already absorbed", or a fresh id 0
  * ==-skipped against a stamp that happens to also be 0 (the one
  * collision a batch-id-only stamp cannot see). With the identity
  * stamped, ANY absorb from a checkpoint other than the one that
  * built the state fails loudly — mixing two id sequences into one
  * state is never well-defined — and within the same checkpoint a
  * below-stamp id still fails as a monotonicity violation. The
  * operator either restores the original checkpoint or starts a
  * fresh state root.
  *
  * An empty batch commits nothing — no version churn, and the stamp
  * stays behind; a later replay of it is skipped or harmlessly
  * re-absorbed as empty. Non-streaming callers can drive
  * [[absorbSink]] directly as a micro-batched backfill loop, passing
  * any stable identifier for their batch-id sequence.
  */
object MvMaintain {

  private val StampCol = "__mv_batch_id"
  private val CkptCol = "__mv_ckpt_id"

  /** (checkpoint id, batch id) stamped on the newest committed state
    * version; None when no state has been committed yet. Pre-identity
    * versions (no `__mv_ckpt_id` column) read back as ckpt "", which
    * can never equal a caller's checkpoint location — so an old state
    * root fails the identity check loudly instead of guessing. */
  def lastAbsorbed(spark: SparkSession, root: String): Option[(String, Long)] =
    IndexStore.committedVersions(spark, root) match {
      case Nil => None
      case vs =>
        val cur = IndexStore.load(spark, s"$root/v${vs.last}")
        val ckpt =
          if (cur.columns.contains(CkptCol))
            cur.agg(coalesce(max(col(CkptCol)), lit(""))).collect()(0).getString(0)
          else ""
        val batch = cur.agg(coalesce(max(col(StampCol)), lit(-1L)))
          .collect()(0).getLong(0)
        Some((ckpt, batch))
    }

  /** Batch id stamped on the newest committed state version; -1 when
    * no state has been committed yet. */
  def lastAbsorbedBatch(spark: SparkSession, root: String): Long =
    lastAbsorbed(spark, root).map(_._2).getOrElse(-1L)

  /** foreachBatch body: absorb `batch` into the state under `root`
    * exactly once. `checkpointId` identifies the batch-id sequence —
    * pass the streaming query's checkpoint location (or any stable
    * token for a batch backfill loop). Wire as
    * `.writeStream.option("checkpointLocation", ckpt)
    *   .foreachBatch(MvMaintain.absorbSink(root, keys, vals, ckpt) _)`. */
  def absorbSink(root: String, keys: Seq[String], vals: Seq[String],
                 checkpointId: String)
                (batch: DataFrame, batchId: Long): Unit = {
    require(checkpointId.nonEmpty,
      "MvMaintain: checkpointId must be non-empty — it is the identity " +
        "of the batch-id sequence and the replay/fresh-checkpoint guard")
    val spark = batch.sparkSession
    lastAbsorbed(spark, root) match {
      case Some((ckpt, _)) if ckpt != checkpointId =>
        throw new IllegalArgumentException(
          s"MvMaintain: state at $root was built by checkpoint '$ckpt' " +
            s"but this absorb comes from checkpoint '$checkpointId' — " +
            "batch ids are only monotone within one checkpoint, so " +
            "absorbing across checkpoints can silently drop or double-" +
            "absorb batches. Restore the original checkpoint or use a " +
            "fresh state root.")
      case Some((_, last)) if batchId == last =>
        return // replayed: absorbed
      case Some((_, last)) =>
        require(batchId > last,
          s"MvMaintain: batchId $batchId is behind the committed stamp " +
            s"$last at $root from the SAME checkpoint '$checkpointId' — " +
            "batch ids within one checkpoint are monotone and only the " +
            "last batch replays, so this absorb would re-apply an " +
            "already-absorbed batch. Refusing.")
      case None => // no state yet
    }
    if (batch.isEmpty) return // nothing to absorb, no version churn
    val delta = IncrementalAgg.partials(batch, keys, vals)
    val merged = IndexStore.committedVersions(spark, root) match {
      case Nil => delta
      case vs => IncrementalAgg.merge(keys, vals, Seq(
        IndexStore.load(spark, s"$root/v${vs.last}")
          .drop(StampCol, CkptCol), delta))
    }
    IndexStore.writeVersioned(
      merged.withColumn(StampCol, lit(batchId))
        .withColumn(CkptCol, lit(checkpointId)), root)
  }

  /** Render the report (avg derived, stamps dropped) from the newest
    * committed state — what a dashboard reads between absorbs. Fails
    * loudly when no state exists yet. */
  def currentReport(spark: SparkSession, root: String, keys: Seq[String],
                    vals: Seq[String]): DataFrame =
    IncrementalAgg.render(keys, vals,
      IndexStore.loadCurrent(spark, root).drop(StampCol, CkptCol))
}
