package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Funnel event/state/update types for [[EventStream.funnelStream]]. */
final case class FunnelEvent(user_id: Long, ts: java.sql.Timestamp, event_type: String)
final case class FunnelProgress(viewUs: Option[Long], clickUs: Option[Long],
                                purchaseUs: Option[Long])
final case class FunnelUpdate(user_id: Long, t_view_us: Option[Long],
                              t_click_us: Option[Long],
                              t_purchase_us: Option[Long], stage: Int)

/** Session event/state/result types for [[EventStream.sessionizeStream]]. */
final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
final case class SessionState(startMs: Long, lastMs: Long, n: Int, sum: Double)
final case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
                               n_events: Int, sum_value: Double)

/** Structured Streaming surface (SURVEY.md §2.8 — extension beyond the
  * reference, which is batch + request/response only).
  *
  * Every transform here is expressed on an unbounded DataFrame, so the
  * SAME function serves the batch twin (tested against the DuckDB
  * oracle via e1/e3) and the streaming pipeline (readStream → transform
  * → writeStream): the plan is identical, only the source differs.
  * That batch/stream symmetry is the Spark-native design — operators
  * are written once and run incrementally under the micro-batch
  * scheduler with watermark-bounded state.
  */
object EventStream {

  /** Tumbling hourly counts per event type. With a streaming source,
    * the 1-hour watermark bounds the state store: a window closes (and
    * its state is freed) once the watermark passes its end. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding 10-minute windows every 5 minutes (each event lands in
    * exactly two windows). */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Gap-based sessionization via the NATIVE `session_window`
    * operator — the state-store-backed merging-sessions aggregation a
    * streaming deployment runs (vs [[sessionizeStream]]'s hand-rolled
    * flatMapGroupsWithState and e4's batch gaps-and-islands window).
    * Each event opens a candidate window [ts, ts+gap) and windows
    * that overlap OR touch merge, so an event exactly `gap` after its
    * predecessor continues the SAME session (StreamingSpec pins the
    * boundary, and the e8 oracle replays `> gap` as the new-session
    * flag — e4's convention). On a STREAMING source the watermark lets the store emit
    * and free a session once no event can still extend it; on STATIC
    * frames withWatermark is a no-op and the same code is the batch
    * twin (the t23/t34/t35 pattern). Session bounds are emitted as
    * epoch micros so the hash-compare is timezone-free. */
  def sessionWindowAgg(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("session_value"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("session_start_us"),
        unix_micros(col("w.end")).as("session_end_us"),
        col("n_events"), col("session_value"))

  /** Stream-stream attribution join: every purchase paired with the
    * same user's clicks in the preceding `gapMinutes` — the canonical
    * Structured Streaming interval join. On STREAMING inputs the
    * watermarks (2× the gap, so a row is only dropped once no
    * in-range partner can still arrive) plus the time-range predicate
    * bound both join-state stores: a buffered click is freed once the
    * purchase watermark passes `click_ts + gap`. On STATIC frames
    * `withWatermark` is a no-op and the SAME code is the batch twin —
    * an equality join on user_id (shuffle keyed on the user, never
    * broadcast-dependent) with the range condition as a post-join
    * filter — which is what the e7 oracle hash-checks (the
    * t23/t34/t35 one-code-path pattern). */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame,
                      gapMinutes: Int = 60): DataFrame = {
    require(gapMinutes >= 1, s"gapMinutes $gapMinutes must be >= 1")
    val wm = s"${2 * gapMinutes} minutes"
    val c = clicks.select(col("event_id").as("click_id"), col("user_id"),
      col("ts").as("click_ts")).withWatermark("click_ts", wm)
    val p = purchases.select(col("event_id").as("purchase_id"),
      col("user_id").as("__p_user"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", wm)
    c.join(p,
        col("user_id") === col("__p_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") +
            expr(s"INTERVAL $gapMinutes MINUTES"))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
          .as("lag_us"))
  }

  /** Streaming sessionization with custom state (the stateful twin of
    * the batch e4 query): gap-based sessions via
    * `flatMapGroupsWithState` + event-time timeout. Sessions closed by
    * an in-batch gap emit immediately; the open session per user lives
    * in the state store and emits when the WATERMARK passes its
    * gap-extended end (EventTimeTimeout) — so state is bounded and
    * every session is emitted exactly once (append semantics). */
  def sessionizeStream(events: DataFrame, gapMinutes: Int = 30,
                       watermark: String = "1 hour"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L

    def close(uid: Long, s: SessionState): ClosedSession =
      ClosedSession(uid, new java.sql.Timestamp(s.startMs), s.n, s.sum)

    def update(uid: Long, it: Iterator[SessionEvent],
               state: GroupState[SessionState]): Iterator[ClosedSession] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map(close(uid, _)).iterator
        state.remove()
        out
      } else {
        val evs = it.toSeq.sortBy(_.ts.getTime)
        val closed = Seq.newBuilder[ClosedSession]
        var cur = state.getOption
        evs.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.lastMs <= gapMs =>
              cur = Some(SessionState(s.startMs, math.max(s.lastMs, t), s.n + 1, s.sum + e.value))
            case Some(s) =>
              closed += close(uid, s)
              cur = Some(SessionState(t, t, 1, e.value))
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // timeout must sit beyond the current watermark
          state.setTimeoutTimestamp(
            math.max(s.lastMs + gapMs, state.getCurrentWatermarkMs() + 1))
        }
        closed.result().iterator
      }
    }

    events
      .selectExpr("user_id", "ts", "value")
      .withWatermark("ts", watermark)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Per-user funnel stage frame — the BATCH half of the funnel pair,
    * shared by the e9 harness query (which rolls it up to stage
    * counts + conversion rates) and the streaming twin's spec. The
    * sequential stage dependency (first click AFTER the first view,
    * first purchase AFTER that click) runs as three chained
    * whole-partition window minimums over ONE user-keyed exchange:
    * t_view is constant within a user's partition, so later stages
    * reference it in the same pass — no per-stage self-joins. */
  def funnelStages(events: DataFrame): DataFrame = {
    val wq = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    events
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("ts"))).over(wq))
      .withColumn("t_click",
        min(when(col("event_type") === "click" &&
          col("ts") > col("t_view"), col("ts"))).over(wq))
      .withColumn("t_purchase",
        min(when(col("event_type") === "purchase" &&
          col("ts") > col("t_click"), col("ts"))).over(wq))
      .select("user_id", "t_view", "t_click", "t_purchase")
      .distinct()
  }

  /** Streaming funnel monitor — the stateful twin of [[funnelStages]]:
    * per-user (first view, first click after it, first purchase after
    * that) maintained in mapGroupsWithState, one updated row per user
    * per micro-batch it changes in (Update semantics — the sink
    * upserts by user_id). State is THREE epoch-micro slots per user —
    * bounded by user cardinality, not event volume (the dataset-card
    * t37 argument: KBs of state per million users), and a slot only
    * ever fills once, so a batch with no stage progress emits nothing.
    * Honest ordering contract: within a batch events are processed in
    * ts order; ACROSS batches the state machine is exact when a
    * user's events arrive in event-time order (the usual log-shipping
    * case). A view arriving AFTER a later-stage slot filled cannot
    * retroactively re-run the click matching — that reprocessing is
    * the batch twin's job, which is why the pair exists (the d1 /
    * dedupStream split applied to funnels). FunnelSpec pins
    * stream ≡ batch on in-order delivery. */
  def funnelStream(events: DataFrame): Dataset[FunnelUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._

    def update(uid: Long, it: Iterator[FunnelEvent],
               state: GroupState[FunnelProgress]): Iterator[FunnelUpdate] = {
      val evs = it.toSeq.sortBy(_.ts.getTime)
      var cur = state.getOption.getOrElse(FunnelProgress(None, None, None))
      val before = cur
      evs.foreach { e =>
        val us = e.ts.getTime * 1000L
        e.event_type match {
          case "view" if cur.viewUs.isEmpty =>
            cur = cur.copy(viewUs = Some(us))
          case "click" if cur.clickUs.isEmpty &&
              cur.viewUs.exists(us > _) =>
            cur = cur.copy(clickUs = Some(us))
          case "purchase" if cur.purchaseUs.isEmpty &&
              cur.clickUs.exists(us > _) =>
            cur = cur.copy(purchaseUs = Some(us))
          case _ => ()
        }
      }
      if (cur == before) Iterator.empty
      else {
        state.update(cur)
        val stage = Seq(cur.viewUs, cur.clickUs, cur.purchaseUs).count(_.isDefined)
        Iterator.single(
          FunnelUpdate(uid, cur.viewUs, cur.clickUs, cur.purchaseUs, stage))
      }
    }

    events
      .selectExpr("user_id", "ts", "event_type")
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(update)
  }

  /** Streaming ingest dedup — the streaming twin of the exact-dedup
    * pass (d1): drop rows whose dedup key (e.g. md5(text)) was already
    * seen, with WATERMARK-BOUNDED state via
    * `dropDuplicatesWithinWatermark`. Exact within the watermark
    * horizon, which is the honest contract for an unbounded ingest — a
    * forever-exact streaming dedup needs unbounded state; dedup
    * against the historical corpus stays a batch join (d1) at the
    * sink. State per key is one entry, freed when the watermark
    * passes. */
  def dedupStream(rows: DataFrame, tsCol: String, keyCols: Seq[String],
                  watermark: String = "1 hour"): DataFrame =
    rows.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Incremental index maintenance: upsert a micro-batch of freshly
    * embedded chunks into the vector index table by chunk id — the
    * streaming twin of the offline build's upsert-by-id semantics
    * (/root/reference/build_vectorstore.py:233-250). Use with
    * `writeStream.foreachBatch(upsertBatch(indexPath) _)`.
    *
    * MERGE-less upsert for plain Parquet: read current, anti-join on
    * id, union the batch, overwrite. At scale the same function body
    * targets a table format with real MERGE semantics; the
    * foreachBatch seam is identical. For a CLUSTER-PARTITIONED index
    * (IVF-assigned batches), prefer
    * [[graft.sources.IndexStore.upsertPartitioned]] inside the batch
    * function — it reads and rewrites only the affected cluster
    * partitions instead of the whole index.
    */
  def upsertBatch(indexPath: String, idCol: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val deduped = batch.dropDuplicates(idCol)
    // Explicit existence check, NOT catch-everything: a transient read
    // failure must fail the micro-batch (and be retried by the stream)
    // rather than truncate the index to just this batch.
    val merged = graft.sources.IndexStore.loadIfExists(spark, indexPath) match {
      case Some(existing) =>
        existing.join(deduped, Seq(idCol), "left_anti").unionByName(deduped)
      case None => deduped
    }
    // localCheckpoint truncates lineage EAGERLY — a plain cache could
    // evict and recompute from the path we're about to overwrite.
    merged.localCheckpoint(true).write.mode("overwrite").parquet(indexPath)
  }
}
