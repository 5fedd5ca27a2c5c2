package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming unique-content monitor — the live form of
  * [[graft.operators.Curation.distinctAudit]] (t24): per event-time
  * window and source, the row count and the HLL++ estimate of
  * distinct content. The ratio is the dedup-pressure signal an ingest
  * pipeline watches: a source whose unique rate collapses started
  * resending its archive, a crawler loop, or boilerplate — and the
  * right reaction (tighten the d11/d12 gate, drop the feed) wants the
  * trend per window, not a one-shot batch census.
  *
  * Why the sketch and not exact distinct: streaming exact distinct
  * per window means state ∝ distinct values per open window; the
  * HLL++ partial aggregate is a fixed ~1.04/rsd² register array per
  * (window × source) group regardless of cardinality, and its merge
  * is a per-register max — commutative, associative, idempotent — so
  * the estimate is INDEPENDENT of batch arrival order and the
  * streaming result equals the batch twin on the same rows exactly
  * (UniqueMonitorSpec pins stream == batch across a 1-batch vs
  * 3-batch split of the same input). Watermarked, append mode: a
  * window emits once, when it closes — the [[DriftMonitor]] contract.
  */
object UniqueMonitor {

  /** Windowed unique-rate counts. `values` needs an event-time column
    * `tsCol`, a group column `srcCol`, and the content column
    * `valCol` (text, fingerprint, or id — whatever dedup keys on).
    * Emits (w_start, srcCol, n_rows, n_unique_est) per closed window;
    * works identically on a static frame (the batch twin / oracle
    * path). */
  def windowedUniqueCounts(values: DataFrame, tsCol: String, srcCol: String,
                           valCol: String, windowLen: String = "1 hour",
                           watermark: String = "1 hour",
                           rsd: Double = 0.02): DataFrame = {
    require(rsd > 0 && rsd < 0.4, s"rsd $rsd must be in (0, 0.4)")
    val src = if (values.isStreaming) values.withWatermark(tsCol, watermark)
              else values
    // Null valCol rows are excluded BEFORE aggregating: count would
    // include them while approx_count_distinct ignores them, so a
    // null-heavy feed would deflate unique_rate and fire the
    // dedup-pressure alarm for a data-quality problem rather than
    // duplication. Same isNotNull contract as HeavyHitterMonitor;
    // nullness is a different monitor's job (f4's validate family).
    src
      .filter(col(valCol).isNotNull)
      .groupBy(window(col(tsCol), windowLen), col(srcCol))
      .agg(count(lit(1)).as("n_rows"),
        approx_count_distinct(col(valCol), rsd).as("n_unique_est"))
      .select(col("window.start").as("w_start"), col(srcCol),
        col("n_rows"), col("n_unique_est"))
  }

  /** The alarm reduction over emitted counts (a batch pass over the
    * sink, closed windows being immutable — the [[DriftMonitor]]
    * split): unique rate per window plus a flag when it drops below
    * `minUniqueRate`. */
  def uniqueRateAlarms(counts: DataFrame, srcCol: String,
                       minUniqueRate: Double): DataFrame = {
    require(minUniqueRate > 0 && minUniqueRate <= 1,
      s"minUniqueRate $minUniqueRate must be in (0, 1]")
    counts.select(col("w_start"), col(srcCol), col("n_rows"),
        col("n_unique_est"),
        round(col("n_unique_est").cast("double") / col("n_rows"), 4)
          .as("unique_rate"))
      .withColumn("alarm", col("unique_rate") < minUniqueRate)
  }
}
