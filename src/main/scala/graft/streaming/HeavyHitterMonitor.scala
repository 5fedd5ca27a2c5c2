package graft.streaming

import graft.operators.HeavyHitters
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Streaming heavy-hitters monitor — the live form of
  * [[graft.operators.HeavyHitters.exact]] (t17) and the fourth
  * streaming leg of the sketch family (drift/JS → [[DriftMonitor]],
  * cardinality/HLL → [[UniqueMonitor]], frequency/Misra-Gries →
  * here). The ingest-side question it answers: which tokens/grams/
  * hosts suddenly dominate a window — a boilerplate burst, a crawler
  * trap, one feed flooding the mixture — without shuffling the
  * window's full vocabulary through the state store.
  *
  * Same two-phase contract as the batch operator, split across the
  * stream/sink boundary:
  *
  *   1. '''Sketch (streaming)''': per event-time window, a
  *      Misra-Gries summary of `capacity` counters as the streaming
  *      aggregation state — the SAME [[HeavyHitters.MisraGries]]
  *      `Aggregator` the batch operator uses, so per-(window) state
  *      is ≤ capacity counters regardless of vocabulary size
  *      (windowed exact counts would hold state ∝ distinct items per
  *      open window). The MG merge bound is additive under ANY merge
  *      tree (mergeable-summaries semantics), so however the
  *      micro-batches slice the input, every item with in-window
  *      frequency > n/(capacity+1) is guaranteed present in the
  *      emitted candidate set — WHICH extra sub-threshold candidates
  *      ride along is batch-split-dependent, the guarantee is not
  *      (UniqueMonitorSpec's twin pins the invariant across splits).
  *      Watermarked, append mode: one candidate row per closed
  *      window, the [[DriftMonitor]] contract.
  *   2. '''Verify (batch over the sink)''': closed windows are
  *      immutable, so the exact recount runs as a batch pass joining
  *      the emitted candidates against the archived rows — broadcast
  *      semi-join (candidates are ≤ capacity · windows, bounded by
  *      construction), partial-agg shuffle of candidate keys only,
  *      integer threshold freq·k > n. The verified answer equals the
  *      naive per-window groupBy answer row-for-row — independent of
  *      which extras the sketch emitted.
  */
object HeavyHitterMonitor {

  /** Windowed Misra-Gries candidate sets. `values` needs an
    * event-time column `tsCol` and an item column `itemCol` (token,
    * gram, source host — whatever the monitor keys on). Emits
    * (w_start, n_rows, cand) per closed window, where `cand` is the
    * ≤ `capacity`-item candidate superset and `n_rows` counts the
    * window's non-null items (the exact-threshold denominator).
    * Works identically on a static frame (the batch twin). */
  def windowedCandidates(values: DataFrame, tsCol: String, itemCol: String,
                         windowLen: String = "1 hour",
                         watermark: String = "1 hour",
                         capacity: Int = 64): DataFrame = {
    require(capacity >= 1, s"capacity $capacity must be >= 1")
    val sketch = udaf(new HeavyHitters.MisraGries(capacity), Encoders.STRING)
    val src = if (values.isStreaming) values.withWatermark(tsCol, watermark)
              else values
    src.filter(col(itemCol).isNotNull)
      .groupBy(window(col(tsCol), windowLen))
      .agg(count(lit(1)).as("n_rows"), sketch(col(itemCol)).as("cand"))
      .select(col("window.start").as("w_start"), col("n_rows"), col("cand"))
  }

  /** Exact heavy hitters per closed window (frequency STRICTLY above
    * n/k): the verify reduction over emitted candidate sets, run as a
    * batch pass against the archived rows (`archive` = the same rows
    * the stream saw — closed windows being immutable, the sink).
    * Returns (w_start, itemCol, freq) — row-for-row the per-window
    * naive `groupBy.count.filter` answer, PROVIDED the sketch ran
    * with capacity ≥ k (the superset guarantee's precondition; the
    * spec pins equality across batch splits). `capacity` must restate
    * the value `windowedCandidates` was called with — a smaller
    * sketch can silently drop true hitters from the candidate set,
    * so the mismatch must fail here, loudly, same as the batch twin
    * [[HeavyHitters.exact]]. */
  def verifiedHitters(archive: DataFrame, counts: DataFrame, tsCol: String,
                      itemCol: String, k: Int, capacity: Int = 64,
                      windowLen: String = "1 hour"): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    require(capacity >= k,
      s"capacity $capacity must be >= k=$k: a smaller Misra-Gries sketch " +
        "does not guarantee every freq > n/k item survives into the " +
        "candidate set, and the verify would silently under-report")
    // A windowLen differing from the one windowedCandidates ran with
    // would make the w_start equi-join miss silently — whole windows
    // dropped, hitters under-reported: the same failure mode the
    // capacity require guards. A sketch-time w_start is by construction
    // aligned to its own window grid, so re-windowing it under THIS
    // windowLen must be the identity; a misaligned row fails loudly.
    val checked = counts.withColumn("w_start",
      when(window(col("w_start"), windowLen).getField("start") =!= col("w_start"),
        raise_error(concat(
          lit("verifiedHitters: counts.w_start "), col("w_start").cast("string"),
          lit(s" does not align to windowLen '$windowLen' — candidates were " +
            "produced with a different window length"))))
        .otherwise(col("w_start")))
    // ≤ capacity·windows candidate rows and one (n) row per window:
    // both broadcast by construction
    val cand = checked.select(col("w_start"), explode(col("cand")).as(itemCol))
    val totals = checked.select(col("w_start"), col("n_rows"))
    archive.filter(col(itemCol).isNotNull)
      .select(window(col(tsCol), windowLen).getField("start").as("w_start"),
        col(itemCol))
      .join(broadcast(cand), Seq("w_start", itemCol), "left_semi")
      .groupBy(col("w_start"), col(itemCol))
      .agg(count(lit(1)).as("freq"))
      .join(broadcast(totals), Seq("w_start"))
      .filter(col("freq") * k > col("n_rows"))
      .select(col("w_start"), col(itemCol), col("freq"))
  }
}
