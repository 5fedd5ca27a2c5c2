package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: assign every document a
  * position in the virtual token stream formed by concatenating the
  * (hash-shuffled) corpus, then cutting it into fixed-`seqLen`
  * training sequences — the standard concatenate-and-chunk packing
  * (documents MAY straddle a sequence boundary; GPT-style pipelines
  * accept the straddle, so packing is pure arithmetic over a global
  * prefix sum and wastes zero tokens).
  *
  * The global prefix sum is the scale-sensitive part: a naive
  * `Window.orderBy(key)` with no partition moves the corpus to ONE
  * partition. Instead the global order is defined as
  * (hashBucket(id, buckets), md5(id), id) — the bucket is the window
  * PARTITION key, so the big cumsum runs as `buckets` independent
  * partitions, and the per-bucket exclusive offsets (a `buckets`-row
  * aggregate) are broadcast back. Order by a hash, not ingest order,
  * doubles as the corpus shuffle every pretraining pipeline wants.
  * Both phases shuffle only (id, n_tokens, hash) scalars — documents
  * themselves never move.
  *
  * Deterministic and engine-portable (md5-derived order, no
  * rand()/partition-layout dependence) — mirrored bit-for-bit by the
  * t15 DuckDB oracle, which replays the same order as one global
  * window.
  */
object Packing {

  /** Per-document packing assignment: `start_tok` (exclusive global
    * prefix), `first_seq`/`last_seq` (sequence ids touched) and
    * `n_seqs` (spanned count; 0 for an empty doc). `nTokCol` is the
    * caller's token count (e.g. TextAnalysis.tokenCountWs) and must be
    * NON-NEGATIVE (seq ids use integral division, which only equals
    * floor on the non-negative domain both engines share). */
  def concatChunk(df: DataFrame, idCol: String, nTokCol: String,
                  seqLen: Int, buckets: Int = 64): DataFrame = {
    require(seqLen >= 1, s"seqLen $seqLen must be >= 1")
    require(buckets >= 1, s"buckets $buckets must be >= 1")
    // coalesce makes the bucket key NON-NULLABLE: otherwise the final
    // inner join inserts isnotnull(__b) filters asymmetrically (pushed
    // under one branch's exchange, left above the other's), the two
    // exchange subtrees stop canonicalizing equal, and ReusedExchange
    // can't fire — doubling the source scan. The order key enforces
    // the non-null id contract LOUDLY instead: md5(null) is null, and
    // Spark sorts nulls first where the DuckDB oracle sorts them last,
    // so a null id would silently produce a divergent packing order —
    // raise_error inside the expression fails the job at the first
    // null row with zero extra passes over the data.
    val base = df.select(col(idCol), col(nTokCol).cast("long").as("__ntok"))
      .withColumn("__b", coalesce(Curation.hashBucket(col(idCol), buckets), lit(0L)))
      .withColumn("__ok", when(col(idCol).isNull,
          raise_error(lit(s"concatChunk: null $idCol — ids must be non-null")))
        .otherwise(md5(col(idCol).cast("string"))))
    // inclusive per-bucket running total; minus __ntok = exclusive
    val perBucket = Window.partitionBy("__b")
      .orderBy(col("__ok"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = base.withColumn("__cum", sum("__ntok").over(perBucket))
    // per-bucket totals -> exclusive bucket offsets (buckets rows; the
    // lit partition declares the tiny global window intentional).
    // Totals come from the WINDOWED branch (max of the inclusive
    // running sum), not from `base`: both branches then sit on the
    // same hash(__b) exchange, which Spark reuses — the source is
    // scanned and tokenized ONCE instead of once per branch.
    val offW = Window.partitionBy(lit(0)).orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy("__b").agg(max("__cum").as("__btot"))
      .withColumn("__off", coalesce(sum("__btot").over(offW), lit(0L)))
      .select("__b", "__off")
    // `div`, not floor(a / b): long/int division through doubles loses
    // integer precision past 2^53 — a >9e15-token stream would get
    // off-by-one seq ids while the oracle's integer `//` stays exact.
    local.join(broadcast(offsets), Seq("__b"))
      .withColumn("start_tok", col("__off") + col("__cum") - col("__ntok"))
      .withColumn("first_seq", expr(s"start_tok div $seqLen"))
      .withColumn("last_seq", when(col("__ntok") > 0,
        expr(s"(start_tok + __ntok - 1) div $seqLen"))
        .otherwise(col("first_seq")))
      .select(col(idCol), col("__ntok").as("n_tokens"), col("start_tok"),
        col("first_seq"), col("last_seq"),
        when(col("__ntok") > 0, col("last_seq") - col("first_seq") + 1)
          .otherwise(lit(0L)).cast("int").as("n_seqs"))
  }
}
