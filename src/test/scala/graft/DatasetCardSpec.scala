package graft

import graft.operators.DatasetCard
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental dataset card (t37): mergeable partial state must fold
  * batches in ANY grouping/order to the same card a single pass over
  * the union produces — that identity is what lets a 100 TB corpus
  * card absorb a batch without a rescan. */
class DatasetCardSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(): DataFrame = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "en", "web"),
    (2L, "the quick brown fox jumps over the lazy dog", "en", "web"),
    (3L, "a completely different document about trains", "en", "web"),
    (4L, "ein kurzer deutscher text ohne besonderheiten", "de", "web"),
    (5L, "short one", "en", "books"),
    (6L, "another books document that is somewhat longer than the rest of them", "en", "books"),
    (7L, "short one", "en", "books"),
    (8L, "troisieme document francais pour la diversite", "fr", "books"),
    (9L, "yet another english document to round out the set", "en", "web"),
    (10L, "the final document in the fixture corpus here", "en", "web"))
    .toDF("doc_id", "text", "lang", "source")
    .withColumn("n_chars", length(col("text")))

  private def parts(df: DataFrame) = DatasetCard.partials(
    df, "doc_id", "text", "source", "lang", "n_chars",
    bucketWidth = 8, lgK = 12)

  private def rendered(p: DatasetCard.Partials): Seq[Row] =
    DatasetCard.render(p)
      .select("source", "n_docs", "n_tokens", "mean_quality", "n_langs",
        "lang_entropy", "p50_bucket", "p90_bucket", "n_unique_est")
      .orderBy("source").collect().toSeq
  private type Row = org.apache.spark.sql.Row

  test("merge of arbitrary splits equals the single-pass card, any order") {
    val docs = corpus()
    val whole = rendered(parts(docs))
    val a = parts(docs.filter(col("doc_id") % 3 === 0))
    val b = parts(docs.filter(col("doc_id") % 3 === 1))
    val c = parts(docs.filter(col("doc_id") % 3 === 2))
    // two different association orders
    assert(rendered(DatasetCard.merge(DatasetCard.merge(a, b), c)) == whole)
    assert(rendered(DatasetCard.merge(a, DatasetCard.merge(c, b))) == whole)
  }

  test("sketch estimate tracks the exact unique census on the fixture") {
    val docs = corpus()
    val est = DatasetCard.render(parts(docs))
      .select("source", "n_unique_est").as[(String, Double)].collect().toMap
    val exact = docs.select(col("source"), md5(col("text")).as("h"))
      .groupBy("source").agg(countDistinct("h").as("u"))
      .as[(String, Long)].collect().toMap
    // tiny cardinalities sit in HLL's exact-sparse range
    exact.foreach { case (src, u) => assert(est(src) == u.toDouble,
      s"$src: est ${est(src)} vs exact $u") }
  }

  test("histogram percentile rule: smallest bucket reaching p*n") {
    // hand-built: source x, buckets 0(n=5), 1(n=3), 2(n=2); n=10
    // cum: 5, 8, 10 -> p50 = bucket 0 (5 >= 5), p90 = bucket 2 (8 < 9)
    val p = DatasetCard.Partials(
      main = Seq(("x", "only")).toDF("source", "h").groupBy("source")
        .agg(max(lit(10L)).as("n_docs"), max(lit(100L)).as("n_tokens"),
          max(lit(5.0)).as("sum_quality"),
          hll_sketch_agg(col("h"), lit(12)).as("uniq_sketch")),
      langs = Seq(("x", "en", 10L)).toDF("source", "lang", "n"),
      hist = Seq(("x", 0L, 5L), ("x", 1L, 3L), ("x", 2L, 2L))
        .toDF("source", "bucket", "n"))
    val r = DatasetCard.render(p)
      .select("p50_bucket", "p90_bucket").as[(Long, Long)].collect().head
    assert(r == ((0L, 2L)))
  }

  test("exact columns equal a direct aggregation over the union") {
    val docs = corpus()
    val merged = DatasetCard.merge(
      parts(docs.filter(col("doc_id") <= 5)),
      parts(docs.filter(col("doc_id") > 5)))
    val m = merged.main.orderBy("source")
      .select("source", "n_docs", "n_tokens")
      .as[(String, Long, Long)].collect().toSeq
    val direct = parts(docs).main.orderBy("source")
      .select("source", "n_docs", "n_tokens")
      .as[(String, Long, Long)].collect().toSeq
    assert(m == direct)
    val langs = merged.langs.orderBy("source", "lang")
      .as[(String, String, Long)].collect().toSeq
    assert(langs == parts(docs).langs.orderBy("source", "lang")
      .as[(String, String, Long)].collect().toSeq)
  }
}
