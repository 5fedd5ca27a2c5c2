package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming corpus-drift monitor — the live form of
  * [[graft.operators.Curation.distributionDrift]] (t22): watch an
  * ingest stream's word distribution move away from a fixed reference
  * (yesterday's corpus, the curated training mix).
  *
  * Split at the stream/batch boundary the same way the ingest pipeline
  * is: the STREAMING side is one watermarked windowed aggregation
  * ([[windowedWordCounts]] — word counts per event-time window, state
  * bounded by the watermark, append mode so a window emits exactly
  * once when it closes), and the drift REDUCTION
  * ([[windowDrift]] — JS divergence per closed window against the
  * reference) is a batch query over the emitted counts. Stacking the
  * two aggregations inside one streaming query would chain stateful
  * operators for no benefit — closed windows are immutable, so the
  * reduction is naturally a batch pass over the sink (exactly how the
  * versioned-index sink splits work in IngestPipeline).
  *
  * Both halves are plain DataFrame transforms, so the batch twin
  * (same functions over a static frame) is what StreamingSpec pins
  * the streaming output against — the e1/e3 symmetry contract. */
object DriftMonitor {

  private val Ws = "[ \t\n]+"

  /** Reference word distribution from a static corpus: (word, p_ref),
    * p_ref summing to 1 over the retained vocabulary. `topN` bounds the
    * vocabulary to the most frequent words (ties broken by word asc —
    * a deterministic total order, so the artifact is reproducible):
    * [[windowDrift]] BROADCASTS this frame and cross-expands it per
    * window, so an unbounded reference vocabulary is a correctness
    * hazard at scale — the cap is a required parameter, not advice.
    * The top-N cut is a TakeOrdered (no single-partition window);
    * probabilities renormalize over the kept words, so the reference
    * stays a proper distribution (and is unchanged whenever the cap
    * is not binding). */
  def wordDistribution(docs: DataFrame, textCol: String, topN: Int): DataFrame = {
    require(topN >= 1,
      s"wordDistribution: topN $topN must be >= 1 — the reference is " +
        "broadcast per window by windowDrift, so its vocabulary must be bounded")
    val counts = docs
      .select(explode(split(trim(col(textCol)), Ws)).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val top = counts.orderBy(col("cnt").desc, col("word")).limit(topN)
    val tot = top.agg(sum("cnt").as("n"))
    top.crossJoin(broadcast(tot))
      .select(col("word"), (col("cnt").cast("double") / col("n")).as("p_ref"))
  }

  /** Word counts per event-time window — the streaming half. One
    * watermarked aggregation: state per (window, word), freed when the
    * watermark passes the window end; append mode emits each window
    * once, closed. Works identically on a static frame (the spec's
    * batch twin). */
  def windowedWordCounts(docs: DataFrame, tsCol: String, textCol: String,
                         windowDur: String = "1 hour",
                         watermark: String = "1 hour"): DataFrame =
    docs
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), explode(split(trim(col(textCol)), Ws)).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(window(col(tsCol), windowDur).as("w"), col("word"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("w_start"), col("word"), col("cnt"))

  /** JS divergence of each closed window's distribution against the
    * reference — the batch half, run over [[windowedWordCounts]]
    * output. Shape: one window-keyed total, a |windows|×|ref-vocab|
    * expansion (bounded: closed windows are few, the reference is a
    * curated distribution), one full-outer word join, one window-keyed
    * sum. Same math as Curation.distributionDrift, same spec-pinned
    * boundary behavior. */
  def windowDrift(counts: DataFrame, reference: DataFrame): DataFrame = {
    val tot = counts.groupBy("w_start").agg(sum("cnt").as("n"))
    val refPerWin = tot.select("w_start").crossJoin(broadcast(reference))
    val j = refPerWin
      .join(counts, Seq("w_start", "word"), "full_outer")
      .join(tot, Seq("w_start"))
      .select(col("w_start"),
        (coalesce(col("cnt"), lit(0L)).cast("double") / col("n")).as("p_w"),
        coalesce(col("p_ref"), lit(0.0)).as("p_r"))
    val m = (col("p_w") + col("p_r")) / 2.0
    val contrib =
      when(col("p_w") > 0, col("p_w") * log(col("p_w") / m) / 2.0)
        .otherwise(lit(0.0)) +
        when(col("p_r") > 0, col("p_r") * log(col("p_r") / m) / 2.0)
          .otherwise(lit(0.0))
    j.groupBy("w_start")
      .agg(round(sum(contrib), 4).as("js_drift"))
  }
}
