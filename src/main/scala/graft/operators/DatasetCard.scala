package graft.operators

import graft.functions.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental dataset-card maintenance: the per-source datasheet
  * (t33's relation) kept as MERGEABLE partial state, so a new batch
  * updates the card without rescanning the corpus — the i2/d15/d17
  * incremental economics applied to corpus statistics.
  *
  * State grains (all tiny — rows ∝ sources × langs × histogram
  * buckets, KBs at any corpus size):
  *   - `main(source, n_docs, n_tokens, sum_quality, uniq_sketch)` —
  *     integer/double sums plus a Datasketches HLL sketch of
  *     md5(text) (Spark's `hll_sketch_agg`), the mergeable stand-in
  *     for the exact unique census t33 pays a corpus-wide
  *     countDistinct for;
  *   - `langs(source, lang, n)` — the language mix, entropy derives
  *     at render time;
  *   - `hist(source, bucket, n)` — a fixed-width n_chars histogram,
  *     bucket = n_chars / bucketWidth; percentiles derive at render
  *     time by the deterministic cumulative rule below.
  *
  * Everything merges exactly (integer sums, map-side-combinable) except
  * the sketch, which merges by HLL register-max (`hll_union_agg`) —
  * order-independent, so merge(a, merge(b, c)) == one pass over
  * a ∪ b ∪ c (DatasetCardSpec pins estimate equality and merge
  * associativity). Double `sum_quality` re-association wobbles below
  * 1e-12 for corpus-scale magnitudes — far under the card's 4-decimal
  * rendering.
  */
object DatasetCard {

  /** Mergeable card state. The three frames share the `source` key. */
  final case class Partials(main: DataFrame, langs: DataFrame, hist: DataFrame)

  /** Build partial state from a document batch. One scan: hashes,
    * token counts and quality are per-row projections; each grain is
    * one keyed aggregation whose exchange carries counts, never text. */
  def partials(docs: DataFrame, idCol: String, textCol: String,
               sourceCol: String, langCol: String, charsCol: String,
               bucketWidth: Int = 64, lgK: Int = 12): Partials = {
    require(bucketWidth >= 1, s"bucketWidth $bucketWidth must be >= 1")
    val perDoc = docs.select(col(sourceCol).as("source"),
      col(langCol).as("lang"),
      (col(charsCol).cast("long") / bucketWidth).cast("long").as("bucket"),
      md5(col(textCol)).as("__h"),
      TextAnalysis.tokenCountWs(col(textCol)).cast("long").as("__nt"),
      TextAnalysis.qualityScore(col(textCol)).as("__q"))
    Partials(
      main = perDoc.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("__nt").as("n_tokens"),
        sum("__q").as("sum_quality"),
        hll_sketch_agg(col("__h"), lit(lgK)).as("uniq_sketch")),
      langs = perDoc.groupBy("source", "lang").agg(count(lit(1)).as("n")),
      hist = perDoc.groupBy("source", "bucket").agg(count(lit(1)).as("n")))
  }

  /** Merge two partial states: sums add, sketches union (register
    * max). Commutative and associative, so batches can fold in any
    * order — and a stored card absorbs a delta at partial-table cost. */
  def merge(a: Partials, b: Partials): Partials = Partials(
    main = a.main.unionByName(b.main).groupBy("source").agg(
      sum("n_docs").as("n_docs"),
      sum("n_tokens").as("n_tokens"),
      sum("sum_quality").as("sum_quality"),
      hll_union_agg(col("uniq_sketch"), lit(true)).as("uniq_sketch")),
    langs = a.langs.unionByName(b.langs)
      .groupBy("source", "lang").agg(sum("n").as("n")),
    hist = a.hist.unionByName(b.hist)
      .groupBy("source", "bucket").agg(sum("n").as("n")))

  /** Render the publishable card from partial state. Percentile rule
    * (deterministic, engine-replayable): p-th bucket = the smallest
    * histogram bucket whose cumulative count reaches p·n_docs. Both
    * sides of the comparison are exact integers scaled by a double —
    * no sketch, no interpolation — so an oracle replays it verbatim;
    * the histogram's resolution (bucketWidth chars) is the disclosed
    * approximation versus t33's exact per-value percentiles. */
  def render(p: Partials): DataFrame = {
    val ent = p.langs
      .withColumn("__n", sum("n").over(Window.partitionBy("source")))
      .groupBy("source").agg(
        count(lit(1)).as("n_langs"),
        round(-sum((col("n") / col("__n")) * log(col("n") / col("__n"))), 6)
          .as("lang_entropy"))
    val cum = p.hist
      .withColumn("__cum", sum("n").over(
        Window.partitionBy("source").orderBy("bucket")))
      .withColumn("__tot", sum("n").over(Window.partitionBy("source")))
    val pct = cum.groupBy("source").agg(
      min(when(col("__cum") >= col("__tot") * 0.5, col("bucket")))
        .as("p50_bucket"),
      min(when(col("__cum") >= col("__tot") * 0.9, col("bucket")))
        .as("p90_bucket"))
    p.main.select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("sum_quality") / col("n_docs"), 4).as("mean_quality"),
        hll_sketch_estimate(col("uniq_sketch")).as("n_unique_est"))
      .join(ent, Seq("source"))
      .join(pct, Seq("source"))
  }
}
