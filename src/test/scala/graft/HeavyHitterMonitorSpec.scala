package graft

import java.sql.Timestamp

import graft.streaming.HeavyHitterMonitor
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming Misra-Gries heavy-hitters monitor: the candidate sets
  * honor the superset guarantee under any batch split, and the
  * verify pass recovers the exact per-window answer end-to-end. */
class HeavyHitterMonitorSpec extends SparkSpec {
  import spark.implicits._

  // hour 1: "the" 40/100 rows, "of" 25/100, tail of 35 distinct rares
  // hour 2: "spam" 60/80 rows (a boilerplate burst), tail of 20 rares
  private def mkRows: Seq[(Timestamp, String)] = {
    val h1 = Timestamp.valueOf("2026-01-01 10:00:00").getTime
    val h2 = Timestamp.valueOf("2026-01-01 11:00:00").getTime
    val hour1 = (0 until 40).map(i => (new Timestamp(h1 + i * 1000L), "the")) ++
      (0 until 25).map(i => (new Timestamp(h1 + 100000L + i * 1000L), "of")) ++
      (0 until 35).map(i => (new Timestamp(h1 + 200000L + i * 1000L), s"rare-$i"))
    val hour2 = (0 until 60).map(i => (new Timestamp(h2 + i * 1000L), "spam")) ++
      (0 until 20).map(i => (new Timestamp(h2 + 100000L + i * 1000L), s"tail-$i"))
    hour1 ++ hour2
  }

  /** Naive per-window exact answer: groupBy(window, item), freq·k > n. */
  private def naive(df: DataFrame, k: Int): Set[(String, String, Long)] = {
    val windowed = df.select(
      window(col("ts"), "1 hour").getField("start").cast("string").as("w"),
      col("item"))
    val totals = windowed.groupBy("w").agg(count(lit(1)).as("n"))
    windowed.groupBy("w", "item").agg(count(lit(1)).as("freq"))
      .join(totals, "w")
      .filter(col("freq") * k > col("n"))
      .select("w", "item", "freq")
      .as[(String, String, Long)].collect().toSet
  }

  private def runStream(batches: Seq[Seq[(Timestamp, String)]],
                        capacity: Int): DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String)]
    val q = HeavyHitterMonitor.windowedCandidates(
        stream.toDF().toDF("ts", "item"), "ts", "item", capacity = capacity)
      .writeStream.format("memory")
      .queryName(s"hh_counts_${batches.size}_$capacity")
      .outputMode("complete").start()
    try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      spark.table(s"hh_counts_${batches.size}_$capacity")
        .select("w_start", "n_rows", "cand").cache()
    } finally q.stop()
  }

  test("candidate sets honor the superset guarantee under any batch split") {
    // true hitters above n/(capacity+1) per window, capacity = 8:
    // hour 1 n=100 → freq > 100/9 ≈ 11.1 → {the, of};
    // hour 2 n=80 → freq > 80/9 ≈ 8.9 → {spam}
    for (split <- Seq(Seq(mkRows), mkRows.grouped(37).toSeq)) {
      val counts = runStream(split, capacity = 8)
        .as[(Timestamp, Long, Seq[String])].collect()
        .map(r => r._1.toString.substring(11, 13) -> ((r._2, r._3.toSet))).toMap
      assert(counts.keySet == Set("10", "11"))
      val (n1, cand1) = counts("10")
      val (n2, cand2) = counts("11")
      assert(n1 == 100L && n2 == 80L)
      assert(Set("the", "of").subsetOf(cand1), s"hour-1 candidates $cand1")
      assert(cand2.contains("spam"), s"hour-2 candidates $cand2")
      assert(cand1.size <= 8 && cand2.size <= 8)
    }
  }

  test("verifiedHitters equals the naive per-window answer, batch-split invariant") {
    val archive = mkRows.toDF("ts", "item")
    val expected = naive(archive, k = 3) // freq > n/3: hour1 {the}, hour2 {spam}
    assert(expected == Set(
      ("2026-01-01 10:00:00", "the", 40L), ("2026-01-01 11:00:00", "spam", 60L)))
    for (split <- Seq(Seq(mkRows), mkRows.grouped(37).toSeq)) {
      val counts = runStream(split, capacity = 8)
      val got = HeavyHitterMonitor.verifiedHitters(archive, counts, "ts", "item", k = 3, capacity = 8)
        .select(col("w_start").cast("string"), col("item"), col("freq"))
        .as[(String, String, Long)].collect().toSet
      assert(got == expected, s"split ${split.size}: $got")
    }
  }

  test("batch twin on a static frame; guards are loud") {
    val archive = mkRows.toDF("ts", "item")
    val counts = HeavyHitterMonitor.windowedCandidates(
      archive, "ts", "item", capacity = 8)
    val got = HeavyHitterMonitor.verifiedHitters(archive, counts, "ts", "item", k = 3, capacity = 8)
      .select(col("w_start").cast("string"), col("item"), col("freq"))
      .as[(String, String, Long)].collect().toSet
    assert(got == naive(archive, k = 3))
    intercept[IllegalArgumentException] {
      HeavyHitterMonitor.windowedCandidates(archive, "ts", "item", capacity = 0)
    }
    intercept[IllegalArgumentException] {
      HeavyHitterMonitor.verifiedHitters(archive, counts, "ts", "item", k = 0)
    }
    // capacity below k: the superset guarantee's precondition fails loudly
    intercept[IllegalArgumentException] {
      HeavyHitterMonitor.verifiedHitters(archive, counts, "ts", "item",
        k = 100, capacity = 8)
    }
  }

  test("a windowLen differing from the sketch's fails loudly, not by dropping windows") {
    // candidates sketched on a 1-hour grid, verify asked for 30 min:
    // the w_start equi-join would silently miss every window and
    // report zero hitters — the guard must throw instead
    val archive = mkRows.toDF("ts", "item")
    val counts = HeavyHitterMonitor.windowedCandidates(
      archive, "ts", "item", capacity = 8) // windowLen = 1 hour
    val e = intercept[Exception] {
      HeavyHitterMonitor.verifiedHitters(archive, counts, "ts", "item",
        k = 3, capacity = 8, windowLen = "37 minutes").collect()
    }
    assert(e.getMessage.contains("does not align to windowLen"),
      s"wrong failure: ${e.getMessage}")
    // a DIFFERENT but grid-compatible windowLen (30 min divides the
    // 1-hour starts) cannot be caught by alignment — document the
    // contract boundary: aligned grids pass the guard
    HeavyHitterMonitor.verifiedHitters(archive, counts, "ts", "item",
      k = 3, capacity = 8, windowLen = "30 minutes").collect()
  }
}
