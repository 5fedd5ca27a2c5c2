package graft

import java.sql.Timestamp

import graft.streaming.UniqueMonitor
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming unique-rate monitor: stream == batch (HLL register merge
  * is order-independent), alarm math pinned by hand. */
class UniqueMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def mkRows: Seq[(Timestamp, String, String)] = {
    val base = Timestamp.valueOf("2026-01-01 10:00:00").getTime
    // hour 1, source a: 20 rows, all distinct; source b: 20 rows, 2 texts
    // hour 2, source a: 20 rows over 4 texts (unique rate collapses)
    (0 until 20).map(i => (new Timestamp(base + i * 60000L), "a", s"doc-$i")) ++
      (0 until 20).map(i => (new Timestamp(base + i * 60000L), "b", s"dup-${i % 2}")) ++
      (0 until 20).map(i =>
        (new Timestamp(base + 3600000L + i * 60000L), "a", s"re-${i % 4}"))
  }

  test("windowedUniqueCounts over a MemoryStream equals the batch twin, batch-split invariant") {
    implicit val sqlCtx = spark.sqlContext
    def run(batches: Seq[Seq[(Timestamp, String, String)]]): Seq[(String, String, Long, Long)] = {
      val stream = MemoryStream[(Timestamp, String, String)]
      val q = UniqueMonitor.windowedUniqueCounts(
          stream.toDF().toDF("ts", "source", "text"), "ts", "source", "text")
        .writeStream.format("memory").queryName("uniq_counts")
        .outputMode("complete").start()
      try {
        batches.foreach { b => stream.addData(b); q.processAllAvailable() }
        spark.table("uniq_counts").orderBy("w_start", "source")
          .select(col("w_start").cast("string"), col("source"),
            col("n_rows"), col("n_unique_est"))
          .as[(String, String, Long, Long)].collect().toSeq
      } finally q.stop()
    }
    val batch = UniqueMonitor.windowedUniqueCounts(
        mkRows.toDF("ts", "source", "text"), "ts", "source", "text")
      .orderBy("w_start", "source")
      .select(col("w_start").cast("string"), col("source"),
        col("n_rows"), col("n_unique_est"))
      .as[(String, String, Long, Long)].collect().toSeq
    // one batch and a 3-way split must BOTH equal the static twin:
    // the HLL merge is a per-register max, so arrival order and batch
    // boundaries cannot change the estimate
    assert(run(Seq(mkRows)) == batch && batch.nonEmpty)
    assert(run(mkRows.grouped(25).toSeq) == batch)
    // and at rsd=2% on tiny cardinalities the estimate is exact
    assert(batch.map(r => (r._2, r._1.substring(11, 13), r._4)).toSet ==
      Set(("a", "10", 20L), ("b", "10", 2L), ("a", "11", 4L)))
  }

  test("uniqueRateAlarms flags the collapsed window only; guards are loud") {
    val counts = UniqueMonitor.windowedUniqueCounts(
      mkRows.toDF("ts", "source", "text"), "ts", "source", "text")
    val got = UniqueMonitor.uniqueRateAlarms(counts, "source", minUniqueRate = 0.5)
      .orderBy("w_start", "source")
      .select(col("source"), col("unique_rate"), col("alarm"))
      .as[(String, Double, Boolean)].collect().toSeq
    assert(got == Seq(("a", 1.0, false), ("b", 0.1, true), ("a", 0.2, true)))
    intercept[IllegalArgumentException] {
      UniqueMonitor.uniqueRateAlarms(counts, "source", minUniqueRate = 0.0)
    }
    intercept[IllegalArgumentException] {
      UniqueMonitor.windowedUniqueCounts(
        mkRows.toDF("ts", "source", "text"), "ts", "source", "text", rsd = 0.5)
    }
  }

  test("null content rows are excluded from n_rows, not just the estimate") {
    // 20 distinct docs + 20 null-text rows in one window: were nulls
    // counted in n_rows (but not by approx_count_distinct), the rate
    // would read 0.5 and fire the dedup alarm for a data-quality
    // problem — the nulls must not deflate unique_rate
    val base = Timestamp.valueOf("2026-01-01 10:00:00").getTime
    val rows = (0 until 20).map(i =>
        (new Timestamp(base + i * 60000L), "a", s"doc-$i")) ++
      (0 until 20).map(i =>
        (new Timestamp(base + i * 60000L), "a", null.asInstanceOf[String]))
    val got = UniqueMonitor.uniqueRateAlarms(
        UniqueMonitor.windowedUniqueCounts(
          rows.toDF("ts", "source", "text"), "ts", "source", "text"),
        "source", minUniqueRate = 0.9)
      .select(col("n_rows"), col("unique_rate"), col("alarm"))
      .as[(Long, Double, Boolean)].collect().toSeq
    assert(got == Seq((20L, 1.0, false)))
  }
}
