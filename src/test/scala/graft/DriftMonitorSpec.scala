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

  test("wordDistribution: topN bounds the vocabulary and renormalizes; 0 is loud") {
    // vocab by frequency: c (3) > b (2) > a (1); topN=2 keeps {c, b}
    // and renormalizes over the kept mass (3+2)
    val docs = Seq((1L, "a b c"), (2L, "b c"), (3L, "c")).toDF("id", "text")
    val got = DriftMonitor.wordDistribution(docs, "text", topN = 2)
      .orderBy("word").as[(String, Double)].collect().toSeq
    assert(got == Seq(("b", 2.0 / 5), ("c", 3.0 / 5)))
    // not binding → identical to the uncapped distribution
    val full = DriftMonitor.wordDistribution(docs, "text", topN = 100)
      .orderBy("word").as[(String, Double)].collect().toSeq
    assert(full == Seq(("a", 1.0 / 6), ("b", 2.0 / 6), ("c", 3.0 / 6)))
    val e = intercept[IllegalArgumentException] {
      DriftMonitor.wordDistribution(docs, "text", topN = 0)
    }
    assert(e.getMessage.contains("topN"))
  }

  test("append mode: a window emits exactly once, after the watermark closes it") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String)]
    val q = DriftMonitor.windowedWordCounts(
        stream.toDF().toDF("ts", "text"), "ts", "text")
      .writeStream.format("memory").queryName("drift_append")
      .outputMode("append").start()
    try {
      def rows() = spark.table("drift_append")
        .select(col("w_start").cast("string"), col("word"), col("cnt"))
        .as[(String, String, Long)].collect().toSeq.sorted
      // batch 1: hour-10 data only — watermark (max ts - 1h) is hours
      // behind the window end, so the open window must NOT emit
      stream.addData(mkDocs.take(30))
      q.processAllAvailable()
      assert(rows().isEmpty, "open window emitted before the watermark passed")
      // batch 2: a 13:30 event advances the watermark to 12:30 ≥ 11:00
      // → the [10:00, 11:00) window closes and emits exactly once
      val late = Timestamp.valueOf("2026-01-01 13:30:00")
      stream.addData(Seq((late, "q")))
      q.processAllAvailable()
      val afterClose = rows()
      assert(afterClose ==
        Seq(("2026-01-01 10:00:00", "a", 30L), ("2026-01-01 10:00:00", "b", 30L)),
        s"closed window should emit its counts once, got $afterClose")
      // batch 3: more data in the still-open 13:00 window — the closed
      // window must not re-emit, the open one must stay unemitted
      stream.addData(Seq((late, "q")))
      q.processAllAvailable()
      assert(rows() == afterClose, "closed window re-emitted or open window leaked")
    } finally q.stop()
  }

  test("windowDrift: in-distribution window ~0, drifted window positive, hand-checked") {
    // reference: the hour-1 mix — P(a) = P(b) = 1/2
    val ref = DriftMonitor.wordDistribution(Seq((1L, "a b")).toDF("id", "text"), "text", topN = 10)
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
