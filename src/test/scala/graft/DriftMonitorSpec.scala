package graft

import java.sql.Timestamp

import graft.streaming.DriftMonitor
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming drift monitor: stream == batch on the windowed counts,
  * drift math pinned against hand computation. */
class DriftMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs: Seq[(Timestamp, String)] = {
    val base = Timestamp.valueOf("2026-01-01 10:00:00").getTime
    // hour 1: matches the reference mix; hour 2: drifted (new word z)
    (0 until 30).map(i => (new Timestamp(base + i * 60000L), "a b")) ++
      (0 until 30).map(i => (new Timestamp(base + 3600000L + i * 60000L), "a z z"))
  }

  test("windowedWordCounts over a MemoryStream matches the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String)]
    stream.addData(mkDocs)
    val q = DriftMonitor.windowedWordCounts(
        stream.toDF().toDF("ts", "text"), "ts", "text")
      .writeStream.format("memory").queryName("drift_counts")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("drift_counts")
        .orderBy("w_start", "word")
        .select(col("w_start").cast("string"), col("word"), col("cnt"))
        .as[(String, String, Long)].collect().toSeq
      val batch = DriftMonitor.windowedWordCounts(mkDocs.toDF("ts", "text"), "ts", "text")
        .orderBy("w_start", "word")
        .select(col("w_start").cast("string"), col("word"), col("cnt"))
        .as[(String, String, Long)].collect().toSeq
      assert(got == batch && got.nonEmpty)
    } finally q.stop()
  }

  test("windowDrift: in-distribution window ~0, drifted window positive, hand-checked") {
    // reference: the hour-1 mix — P(a) = P(b) = 1/2
    val ref = DriftMonitor.wordDistribution(Seq((1L, "a b")).toDF("id", "text"), "text")
    val counts = DriftMonitor.windowedWordCounts(mkDocs.toDF("ts", "text"), "ts", "text")
    val drift = DriftMonitor.windowDrift(counts, ref)
      .orderBy("w_start")
      .select(col("w_start").cast("string"), col("js_drift"))
      .as[(String, Double)].collect().toSeq
    assert(drift.size == 2)
    assert(drift(0)._2 == 0.0, s"in-distribution window drifted: ${drift(0)}")
    // hour 2: P_w = {a: 1/3, z: 2/3}; ref = {a: 1/2, b: 1/2}
    def kl(p: Double, m: Double) = if (p == 0) 0.0 else p * math.log(p / m)
    val want = BigDecimal((
      kl(1.0 / 3, (1.0 / 3 + 0.5) / 2) / 2 + kl(2.0 / 3, 1.0 / 3) / 2 // P_w side: a, z
        + kl(0.5, (1.0 / 3 + 0.5) / 2) / 2 + kl(0.5, 0.25) / 2          // ref side: a, b
      )).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(drift(1)._2 == want, s"hour-2 drift ${drift(1)._2} != $want")
  }
}
