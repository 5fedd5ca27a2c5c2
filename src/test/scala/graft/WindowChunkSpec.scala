package graft

import graft.operators.WindowChunk
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Chunked trailing-RANGE window == the plain single-partition window,
  * row for row — including order-key ties (RANGE peers), exact-boundary
  * frame edges, negative order keys, and chunkLen > lookback. */
class WindowChunkSpec extends SparkSpec {
  import spark.implicits._

  private def plain(df: org.apache.spark.sql.DataFrame, lookback: Long) = {
    val w = Window.partitionBy("k").orderBy(col("o"))
      .rangeBetween(-lookback, 0)
    df.select(col("k"), col("o"), col("v"),
      count(lit(1)).over(w).as("n"), sum(col("v")).over(w).as("s"))
  }

  private def chunked(df: org.apache.spark.sql.DataFrame, lookback: Long,
                      chunkLen: Long = 0L) =
    WindowChunk.trailingRange(df, Seq("k"), "o", lookback,
      Seq((count(lit(1)), "n"), (sum(col("v")), "s")), chunkLen)

  test("property: chunked == plain for random keys/orders, incl. ties and negatives") {
    import org.scalacheck.Gen
    val gen = for {
      n <- Gen.choose(1, 60)
      lookback <- Gen.oneOf(1L, 3L, 7L)
      mult <- Gen.oneOf(1L, 2L, 5L) // chunkLen = lookback * mult
      rows <- Gen.listOfN(n, for {
        k <- Gen.oneOf("a", "b", "hot")
        o <- Gen.choose(-20L, 20L) // dense → ties and boundary hits
        v <- Gen.choose(-9L, 9L)
      } yield (k, o, v))
    } yield (lookback, mult, rows)
    PropHelper.forAll(gen, n = 12) { case (lookback, mult, rows) =>
      val df = rows.toDF("k", "o", "v")
      val exp = plain(df, lookback)
        .orderBy("k", "o", "v", "n", "s").collect().toSeq
      val got = chunked(df, lookback, lookback * mult)
        .orderBy("k", "o", "v", "n", "s").collect().toSeq
      assert(got == exp, s"lookback=$lookback chunk=${lookback * mult}")
    }
  }

  test("a frame spanning the bucket boundary picks up exactly the context tail") {
    // lookback 10, chunkLen 10: row at o=21 (bucket 2) must see o=11..21
    // — 11..19 live in bucket 1 and arrive only as context copies
    val df = Seq(("u", 5L, 1L), ("u", 11L, 2L), ("u", 15L, 4L),
      ("u", 19L, 8L), ("u", 21L, 16L)).toDF("k", "o", "v")
    val got = chunked(df, 10L).orderBy("o")
      .select("o", "n", "s").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((5L, 1L, 1L), (11L, 2L, 3L), (15L, 3L, 7L),
      (19L, 3L, 14L), (21L, 4L, 30L)))
  }

  test("the hot key's window spreads across order-axis buckets (the skew claim)") {
    // one key, orders 0..999, lookback 10 → ~100 (key, bucket) groups;
    // the chunked plan's window partitioning must include the bucket,
    // so no single task owns the key's whole history
    val df = (0L until 1000L).map(o => ("hot", o, 1L)).toDF("k", "o", "v")
    val exp = plain(df, 10L).orderBy("o").select("n").as[Long].collect().toSeq
    val got = chunked(df, 10L).orderBy("o").select("n").as[Long].collect().toSeq
    assert(got == exp)
    // distinct buckets actually materialized in the chunked grouping
    val buckets = df.select(expr("(o - pmod(o, 10L)) div 10L").as("b"))
      .distinct().count()
    assert(buckets == 100L)
  }

  test("trailingRangeAuto dispatches on the measured key histogram, identical rows either way") {
    def auto(df: org.apache.spark.sql.DataFrame, threshold: Long) =
      WindowChunk.trailingRangeAuto(df, Seq("k"), "o", 10L,
        Seq((count(lit(1)), "n"), (sum(col("v")), "s")),
        hotKeyThreshold = threshold)
    // hot key: 200 rows on one key, threshold 50 → CHUNKED plan (the
    // __wc_bucket column appears in its window partitioning); uniform:
    // 10 rows/key under threshold → PLAIN plan (no bucket column)
    val hot = ((0L until 200L).map(o => ("hot", o, 1L)) ++
      (0L until 10L).map(o => ("cold", o, 2L))).toDF("k", "o", "v")
    val hotAuto = auto(hot, 50L)
    assert(hotAuto.queryExecution.executedPlan.toString.contains("__wc_bucket"),
      "a hot key above threshold must take the chunked plan")
    val plainAuto = auto(hot, 1000L)
    assert(!plainAuto.queryExecution.executedPlan.toString.contains("__wc_bucket"),
      "an unskewed frame must take the plain window plan")
    // both choices are row-identical to the plain reference
    val exp = plain(hot, 10L).orderBy("k", "o", "v").collect().toSeq
    assert(hotAuto.orderBy("k", "o", "v").collect().toSeq == exp)
    assert(plainAuto.orderBy("k", "o", "v").collect().toSeq == exp)
    // the exact-threshold boundary stays plain (strictly-greater fires)
    assert(WindowChunk.maxKeyRows(hot, Seq("k")) == 200L)
    assert(!auto(hot, 200L).queryExecution.executedPlan.toString
      .contains("__wc_bucket"))
    // the plain branch refuses null order keys just like the chunked one
    val withNull = Seq(("u", java.lang.Long.valueOf(1L), 1L),
      ("u", null.asInstanceOf[java.lang.Long], 2L)).toDF("k", "o", "v")
    val e = intercept[Exception] { auto(withNull, 1000L).collect() }
    assert(e.getMessage.contains("null order key"))
    // empty frame: maxKeyRows is 0, plain branch, zero rows out
    val empty = Seq.empty[(String, Long, Long)].toDF("k", "o", "v")
    assert(WindowChunk.maxKeyRows(empty, Seq("k")) == 0L)
    assert(auto(empty, 10L).isEmpty)
    // an invalid chunkLen is refused EAGERLY even when today's data is
    // unskewed and would take the plain branch — a config error must
    // not lie dormant until the first skewed day
    val e2 = intercept[IllegalArgumentException] {
      WindowChunk.trailingRangeAuto(hot, Seq("k"), "o", 10L,
        Seq((count(lit(1)), "n")), hotKeyThreshold = 1000L, chunkLen = 5L)
    }
    assert(e2.getMessage.contains("chunkLen"))
  }

  test("guards are loud: null order key, chunkLen < lookback, empty aggs") {
    val df = Seq(("u", java.lang.Long.valueOf(1L), 1L),
      ("u", null.asInstanceOf[java.lang.Long], 2L)).toDF("k", "o", "v")
    val e = intercept[Exception] { chunked(df, 5L).collect() }
    assert(e.getMessage.contains("null order key"))
    val ok = Seq(("u", 1L, 1L)).toDF("k", "o", "v")
    val e2 = intercept[IllegalArgumentException] { chunked(ok, 10L, 5L) }
    assert(e2.getMessage.contains("chunkLen"))
    val e3 = intercept[IllegalArgumentException] {
      WindowChunk.trailingRange(ok, Seq("k"), "o", 5L, Seq.empty)
    }
    assert(e3.getMessage.contains("at least one aggregate"))
  }
}
