package graft

import java.sql.Timestamp

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The funnel pair (e9 batch roll-up / funnelStream stateful twin):
  * sequential stage semantics, in-order stream ≡ batch, and the
  * honest cross-batch ordering contract. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def t(m: String) = Timestamp.valueOf(s"2026-01-01 $m:00")

  // user 1: full funnel; user 2: purchase BEFORE its click (must not
  // count) and a click before its view (must not count); user 3: view
  // only; user 4: click/purchase but never a view (stage 0 forever).
  private def evs: Seq[(Long, Timestamp, String)] = Seq(
    (1L, t("10:00"), "view"), (1L, t("10:05"), "click"),
    (1L, t("10:10"), "purchase"),
    (2L, t("09:55"), "click"), (2L, t("10:02"), "view"),
    (2L, t("10:04"), "purchase"), (2L, t("10:06"), "click"),
    (2L, t("10:20"), "purchase"),
    (3L, t("11:00"), "view"),
    (4L, t("11:00"), "click"), (4L, t("11:01"), "purchase"))

  test("funnelStages: stage minimums honor the sequential dependency") {
    val got = EventStream.funnelStages(evs.toDF("user_id", "ts", "event_type"))
      .orderBy("user_id")
      .select(col("user_id"), col("t_view").cast("string"),
        col("t_click").cast("string"), col("t_purchase").cast("string"))
      .as[(Long, Option[String], Option[String], Option[String])]
      .collect().toSeq
    assert(got == Seq(
      (1L, Some("2026-01-01 10:00:00"), Some("2026-01-01 10:05:00"),
        Some("2026-01-01 10:10:00")),
      // user 2: the 09:55 click precedes the view; first valid click is
      // 10:06, so the 10:04 purchase is out and 10:20 counts
      (2L, Some("2026-01-01 10:02:00"), Some("2026-01-01 10:06:00"),
        Some("2026-01-01 10:20:00")),
      (3L, Some("2026-01-01 11:00:00"), None, None),
      (4L, None, None, None)))
  }

  test("funnelStream over a MemoryStream matches the batch twin (in-order batches)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String)]
    val q = EventStream.funnelStream(
        stream.toDF().toDF("user_id", "ts", "event_type"))
      .writeStream.format("memory").queryName("funnel_test")
      .outputMode("update").start()
    try {
      // two in-event-time-order micro-batches splitting users' funnels
      val (b1, b2) = evs.sortBy(_._2.getTime).splitAt(6)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      // Update mode: the LAST row per user is its final state
      val got = spark.table("funnel_test")
        .withColumn("__n", monotonically_increasing_id())
        .groupBy("user_id")
        .agg(max(struct(col("__n"), col("t_view_us"), col("t_click_us"),
          col("t_purchase_us"), col("stage"))).as("m"))
        .select(col("user_id"), col("m.t_view_us"), col("m.t_click_us"),
          col("m.t_purchase_us"), col("m.stage"))
        .orderBy("user_id")
        .as[(Long, Option[Long], Option[Long], Option[Long], Int)]
        .collect().toSeq
      val want = EventStream.funnelStages(evs.toDF("user_id", "ts", "event_type"))
        .select(col("user_id"), unix_micros(col("t_view")).as("v"),
          unix_micros(col("t_click")).as("c"),
          unix_micros(col("t_purchase")).as("p"))
        .orderBy("user_id")
        .as[(Long, Option[Long], Option[Long], Option[Long])]
        .collect().toSeq
        .filter(r => r._2.isDefined || r._3.isDefined || r._4.isDefined)
        .map(r => (r._1, r._2, r._3, r._4,
          Seq(r._2, r._3, r._4).count(_.isDefined)))
      assert(got == want,
        s"stream-vs-batch funnel mismatch:\ngot =$got\nwant=$want")
      // user 4 never progressed: no update row at all
      assert(!got.exists(_._1 == 4L))
    } finally q.stop()
  }

  test("funnelStream: a batch with no stage progress emits nothing new") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String)]
    val q = EventStream.funnelStream(
        stream.toDF().toDF("user_id", "ts", "event_type"))
      .writeStream.format("memory").queryName("funnel_idle_test")
      .outputMode("update").start()
    try {
      stream.addData(Seq((1L, t("10:00"), "view")))
      q.processAllAvailable()
      val n1 = spark.table("funnel_idle_test").count()
      // duplicate view + an error event: no slot changes
      stream.addData(Seq((1L, t("10:30"), "view"), (1L, t("10:31"), "error")))
      q.processAllAvailable()
      val n2 = spark.table("funnel_idle_test").count()
      assert(n1 == 1L && n2 == 1L,
        s"idle batch must not re-emit: n1=$n1 n2=$n2")
    } finally q.stop()
  }
}
