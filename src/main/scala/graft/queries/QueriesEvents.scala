package graft

import graft.functions.{TextAnalysis, TextFunctions, VectorFunctions}
import graft.multimodal.{DecodeStub, Multimodal}
import graft.operators.{Ann, Bm25, Chunker, Curation, Dedup, HeavyHitters, Knn, LshAnn, Mmr, MultiStageSearch, Packing, QualityModel, Rerank, RetrievalEval}
import graft.sources.JobCorpus
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Events: windowed aggregation + permissive JSON (P7; streaming's
  * batch twin — the same plans run under readStream, see graft.streaming).
  */
private[graft] trait QueriesEvents { self: QueriesShared =>


  private val e1 = QuerySpec("e1_events_hourly",
    (s, d) => events(s, d)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("hour", "event_type"),
    Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
      event_type, count(*) AS n, round(sum(value),2) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))


  private val e2 = QuerySpec("e2_events_props_json",
    (s, d) => events(s, d)
      .withColumn("p", when(col("event_id") % 7 === 0,
        expr("substring(props, 1, length(props)-2)")).otherwise(col("props")))
      .withColumn("k",
        from_json(col("p"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k"))
      .groupBy("event_type")
      .agg(sum("k").cast("bigint").as("sum_k"),
        count(when(col("k").isNull, 1)).as("n_bad"),
        count(lit(1)).as("n"))
      .orderBy("event_type"),
    Some("""SELECT event_type, CAST(sum(k) AS BIGINT) AS sum_k,
      count(CASE WHEN k IS NULL THEN 1 END) AS n_bad, count(*) AS n FROM (
      SELECT event_type,
        CASE WHEN json_valid(p) THEN CAST(json_extract_string(p, '$.k') AS INT) END AS k
      FROM (SELECT event_type,
        CASE WHEN event_id % 7 = 0 THEN substr(props, 1, len(props)-2) ELSE props END AS p
        FROM events))
      GROUP BY event_type ORDER BY event_type"""))


  private val e4 = QuerySpec("e4_sessionize",
    // Gap-based sessionization (30-min inactivity): lag + cumulative
    // sum of session-start flags per user — the standard windowed
    // formulation, identical in both engines. Nanos-integer gap math
    // avoids float drift.
    (s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(s, d)
        .withColumn("prev_ts", lag("ts", 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L, 1)
            .otherwise(0))
        .withColumn("session_idx",
          sum("new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("session_value"))
        .groupBy("user_id")
        .agg(max("session_idx").cast("bigint").as("n_sessions"),
          max("n_events").as("max_session_events"),
          round(max("session_value"), 2).as("max_session_value"))
        .orderBy("user_id")
    },
    Some("""WITH flagged AS (
        SELECT user_id, value,
          CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session,
          us, event_id
        FROM (SELECT user_id, value, event_id, epoch_ns(ts) // 1000 AS us,
          -- order by the MICROS-truncated ts (not raw TIMESTAMP_NS): Spark's
          -- ts is micros, so the tie-break domain must match exactly or two
          -- same-user events within one micro could order differently
          lag(epoch_ns(ts) // 1000) OVER (PARTITION BY user_id
            ORDER BY epoch_ns(ts) // 1000, event_id) AS prev_us
          FROM events)),
      sessions AS (
        SELECT user_id, value,
          sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        FROM flagged),
      per_session AS (
        SELECT user_id, session_idx, count(*) AS n_events,
          round(sum(value), 2) AS session_value
        FROM sessions GROUP BY user_id, session_idx)
      SELECT user_id, CAST(max(session_idx) AS BIGINT) AS n_sessions,
        max(n_events) AS max_session_events,
        round(max(session_value), 2) AS max_session_value
      FROM per_session GROUP BY user_id ORDER BY user_id"""))


  private val e5 = QuerySpec("e5_asof_join",
    // As-of join (AsOfJoin.lastBefore): every click event gets the
    // user's latest prior purchase value — the temporal join Spark
    // lacks, via the union + last(ignoreNulls) window (one shuffle by
    // user, zero joins). Timestamps compare in MICROS on both sides
    // (same tie-break domain as e4); the right side pre-aggregates to
    // one row per (user, ts) so ties are deterministic — the same
    // contract DuckDB's native ASOF JOIN (the oracle here) has.
    (s, d) => {
      val ev = events(s, d).withColumn("us", unix_micros(col("ts")))
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "us")
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "us").agg(max("value").as("pval"))
      graft.operators.AsOfJoin.lastBefore(
          clicks, purchases, "user_id", "us", "us", "pval",
          outCol = "last_purchase")
        .select(col("event_id"), col("user_id"),
          round(col("last_purchase"), 2).as("last_purchase"))
        .orderBy("event_id")
    },
    Some("""WITH l AS (SELECT event_id, user_id, epoch_ns(ts)//1000 AS us
          FROM events WHERE event_type = 'click'),
      r AS (SELECT user_id, epoch_ns(ts)//1000 AS us, max(value) AS pval
          FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      SELECT l.event_id, l.user_id, round(r.pval, 2) AS last_purchase
      FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.us >= r.us
      ORDER BY event_id"""))


  private val e7 = QuerySpec("e7_attribution_join",
    // Stream-stream attribution (EventStream.attributionJoin): every
    // purchase paired with the same user's clicks in the preceding
    // hour — the canonical Structured Streaming interval join, run
    // here on the STATIC events table where withWatermark is a no-op
    // and the same code is the batch twin (the t23/t34/t35 pattern;
    // StreamingSpec pins stream == batch with two MemoryStreams).
    // Batch plan: one user_id-keyed equality shuffle with the time
    // range as a post-join filter; streaming plan: both join-state
    // stores bounded by the 2×gap watermarks. The oracle mirrors the
    // micros-truncate-then-compare arithmetic exactly (the e4
    // precedent for nanos-generation data).
    (s, d) => {
      val ev = events(s, d)
      graft.streaming.EventStream.attributionJoin(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"), gapMinutes = 60)
        .orderBy("purchase_id", "click_id")
    },
    Some("""WITH c AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us
        FROM events WHERE event_type = 'click'),
      p AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us
        FROM events WHERE event_type = 'purchase')
      SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        c.user_id, p.us - c.us AS lag_us
      FROM c JOIN p ON c.user_id = p.user_id
      WHERE p.us >= c.us AND p.us <= c.us + 3600000000
      ORDER BY purchase_id, click_id"""))


  private val e8 = QuerySpec("e8_session_window",
    // e4's sessionization via the NATIVE session_window operator —
    // the merging-sessions aggregation whose streaming form is
    // state-store-backed and watermark-bounded (EventStream scaladoc;
    // EventStreamSpec pins stream == batch and the gap boundary).
    // Run on the static events table the same code is the batch twin,
    // hash-checked here. Boundary semantics: candidate windows
    // [ts, ts+gap) merge when they overlap OR touch (spec-pinned), so
    // a successor exactly gap later continues the session — the
    // oracle's new-session flag is `> gap`, e4's convention, making
    // e8 the operator-level twin of e4's windowed formulation.
    (s, d) => graft.streaming.EventStream
      .sessionWindowAgg(events(s, d), gapMinutes = 30)
      .orderBy("user_id", "session_start_us"),
    Some("""WITH e AS (SELECT user_id, value, event_id,
          epoch_ns(ts) // 1000 AS us FROM events),
      flagged AS (SELECT user_id, value, us, event_id,
          CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
            THEN 1 ELSE 0 END AS new_s
        FROM (SELECT user_id, value, us, event_id,
          lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
            AS prev_us FROM e)),
      sess AS (SELECT user_id, value, us,
          sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged)
      SELECT user_id, min(us) AS session_start_us,
        max(us) + 1800000000 AS session_end_us,
        count(*) AS n_events, round(sum(value), 2) AS session_value
      FROM sess GROUP BY user_id, sid
      ORDER BY user_id, session_start_us"""))


  private val e6 = QuerySpec("e6_range_join",
    // Keyless range join (RangeJoin.pairsWithin): click/purchase pairs
    // within 60s of each other across ALL users — no equi key, so the
    // naive form is a BroadcastNestedLoopJoin; the bucketed form
    // shuffles integer bucket keys and compares candidates only.
    // Oracle is the plain inequality join (exact same pair set).
    (s, d) => {
      val ev = events(s, d).withColumn("us", unix_micros(col("ts")))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("us").as("click_us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("us").as("purchase_us"))
      graft.operators.RangeJoin.pairsWithin(
          clicks, purchases, "click_us", "purchase_us", 60000000L)
        .select(col("click_id"), col("purchase_id"),
          (col("purchase_us") - col("click_us")).as("delta_us"))
        .orderBy("click_id", "purchase_id")
    },
    Some("""WITH l AS (SELECT event_id AS click_id, epoch_ns(ts)//1000 AS click_us
          FROM events WHERE event_type = 'click'),
      r AS (SELECT event_id AS purchase_id, epoch_ns(ts)//1000 AS purchase_us
          FROM events WHERE event_type = 'purchase')
      SELECT click_id, purchase_id, purchase_us - click_us AS delta_us
      FROM l JOIN r ON abs(click_us - purchase_us) <= 60000000
      ORDER BY click_id, purchase_id"""))

  // ======================================================================
  // Scalar text transforms (P1/P5/P6/P9/P10/P11)
  // ======================================================================


  private val e3 = QuerySpec("e3_events_sliding",
    // Sliding 10-min/5-min windows (each event in exactly 2 windows) —
    // the batch twin of graft.streaming.EventStream.slidingCounts.
    (s, d) => events(s, d)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("w_start", "event_type"),
    Some("""WITH e AS (SELECT epoch_ns(ts) AS ns, event_type, value FROM events),
      wins AS (SELECT unnest([(ns // 300000000000) * 300,
                              (ns // 300000000000) * 300 - 300]) AS ws,
               event_type, value FROM e)
      SELECT strftime(make_timestamp(ws * 1000000), '%Y-%m-%d %H:%M:%S') AS w_start,
        event_type, count(*) AS n, round(sum(value), 2) AS sum_value
      FROM wins GROUP BY 1, 2 ORDER BY 1, 2"""))

  private val e9 = QuerySpec("e9_funnel",
    // Ordered funnel (view → click → purchase): for each user, the
    // first view, the first click AFTER that view, the first purchase
    // AFTER that click — then stage counts and conversion rates. The
    // sequential dependency (stage N's window starts at stage N-1's
    // timestamp) is what separates a funnel from three independent
    // counts, and it is expressible as THREE chained whole-partition
    // window minimums over ONE user-keyed exchange: t_view is
    // constant per user, so t_click's conditional min can reference
    // it in the same pass, and t_purchase likewise — no self-joins,
    // no per-stage corpus re-scan (the join formulation pays three).
    // Per-user frames are event-count bounded; only (user, 3
    // timestamps) survive into the distinct + 1-row roll-up.
    (s, d) => {
      // per-user stages shared with the streaming twin
      // (EventStream.funnelStream; FunnelSpec pins stream ≡ batch)
      val staged = graft.streaming.EventStream.funnelStages(events(s, d))
      staged.agg(
        count(lit(1)).as("n_users"),
        count(col("t_view")).as("n_viewed"),
        count(col("t_click")).as("n_clicked_after_view"),
        count(col("t_purchase")).as("n_purchased_after_click"),
        round(count(col("t_click")) / count(col("t_view")), 6)
          .as("view_to_click"),
        round(count(col("t_purchase")) / count(col("t_click")), 6)
          .as("click_to_purchase"))
    },
    Some("""WITH u AS (SELECT user_id,
        min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
        FROM events GROUP BY user_id),
      c AS (SELECT e.user_id, min(ts) AS t_click
        FROM events e JOIN u USING (user_id)
        WHERE event_type = 'click' AND ts > t_view GROUP BY e.user_id),
      p AS (SELECT e.user_id, min(ts) AS t_purchase
        FROM events e JOIN c USING (user_id)
        WHERE event_type = 'purchase' AND ts > t_click GROUP BY e.user_id),
      f AS (SELECT u.user_id, u.t_view, c.t_click, p.t_purchase
        FROM u LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id))
      SELECT count(*) AS n_users, count(t_view) AS n_viewed,
        count(t_click) AS n_clicked_after_view,
        count(t_purchase) AS n_purchased_after_click,
        round(count(t_click) / CAST(count(t_view) AS DOUBLE), 6)
          AS view_to_click,
        round(count(t_purchase) / CAST(count(t_click) AS DOUBLE), 6)
          AS click_to_purchase
      FROM f"""))

  private val e10 = QuerySpec("e10_cohort_retention",
    // Weekly cohort retention: users grouped by first-active week,
    // then for each (cohort, week-offset) the fraction of the cohort
    // active that week — the product-analytics staple next to the e9
    // funnel. Scale shape: ONE distinct over (user, week) pairs (the
    // exchange carries 16-byte pairs, never event payloads), a
    // user-keyed min for the cohort, a user-keyed join of the two
    // (both sides already hash-partitioned by user), a
    // (cohort, offset)-keyed count where rows are ALREADY unique per
    // (user, week) — so count(1), no second distinct — and a
    // broadcast join of the ≤ #weeks cohort-size table. Week
    // arithmetic: both engines truncate to Monday and both offsets
    // are exact-multiple-of-7 day diffs, integer-divided.
    (s, d) => {
      val ev = events(s, d)
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
        .distinct()
      val first = ev.groupBy("user_id").agg(min("wk").as("cohort_wk"))
      val sizes = first.groupBy("cohort_wk")
        .agg(count(lit(1)).as("cohort_size"))
      ev.join(first, "user_id")
        .withColumn("week_offset",
          (datediff(col("wk"), col("cohort_wk")) / 7).cast("long"))
        .groupBy("cohort_wk", "week_offset")
        .agg(count(lit(1)).as("n_active"))
        .join(broadcast(sizes), "cohort_wk")
        .select(
          date_format(col("cohort_wk"), "yyyy-MM-dd").as("cohort_week"),
          col("week_offset"), col("n_active"), col("cohort_size"),
          round(col("n_active") / col("cohort_size"), 6).as("retention"))
        .orderBy("cohort_week", "week_offset")
    },
    Some("""WITH ev AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
        FROM events),
      firstw AS (SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY user_id),
      sizes AS (SELECT cohort_wk, count(*) AS cohort_size
        FROM firstw GROUP BY cohort_wk),
      act AS (SELECT f.cohort_wk,
          CAST(date_diff('day', f.cohort_wk, e.wk) // 7 AS BIGINT) AS week_offset,
          count(*) AS n_active
        FROM ev e JOIN firstw f USING (user_id) GROUP BY 1, 2)
      SELECT strftime(a.cohort_wk, '%Y-%m-%d') AS cohort_week,
        a.week_offset, a.n_active, s.cohort_size,
        round(a.n_active / CAST(s.cohort_size AS DOUBLE), 6) AS retention
      FROM act a JOIN sizes s USING (cohort_wk)
      ORDER BY cohort_week, week_offset"""))

  private val e11 = QuerySpec("e11_rolling_features",
    // Trailing-interval features per event — the feature-engineering
    // staple (how active was this user in the hour BEFORE this
    // event?): a RANGE frame over epoch seconds, the one window
    // surface (value-based frames) the suite didn't yet exercise.
    // RANGE semantics are pinned portable: both engines include
    // same-timestamp peers in the frame, and ordering on truncated
    // epoch SECONDS (Spark's timestamp→long cast FLOORS; DuckDB must
    // replay with CAST(floor(epoch(ts)) AS BIGINT) because its
    // double→BIGINT cast ROUNDS — sf0.1's fractional-second events
    // land one frame off otherwise, caught by the gate) keeps frame
    // membership identical. Summed value rides as exact integer cents
    // (the q12 idiom) so frame sums are bit-exact regardless of
    // intra-frame fold order. ONE user-keyed exchange; frames are
    // bounded by an hour of per-user activity.
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("__tsec"))
        .rangeBetween(-3600, 0)
      events(s, d)
        .select(col("user_id"), col("event_id"),
          col("ts").cast("long").as("__tsec"),
          round(col("value") * 100, 0).cast("long").as("__vc"))
        .select(col("user_id"), col("event_id"),
          count(lit(1)).over(w).as("n_1h"),
          sum("__vc").over(w).as("sum_cents_1h"))
        .orderBy("user_id", "event_id")
    },
    Some(rollingFeaturesSql))

  // Shared by e11 (plain window) and e12 (chunked window): the two
  // plans are row-identical by construction, so ONE oracle checks both
  // and cannot drift between them.
  private def rollingFeaturesSql: String =
    """SELECT user_id, event_id, n_1h, sum_cents_1h FROM (
        SELECT user_id, event_id,
          count(*) OVER w AS n_1h,
          CAST(sum(value_cents) OVER w AS BIGINT) AS sum_cents_1h
        FROM (SELECT user_id, event_id,
              CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
              CAST(round(value * 100, 0) AS BIGINT) AS value_cents
              FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY tsec
          RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW))
      ORDER BY user_id, event_id"""

  private val e12 = QuerySpec("e12_rolling_features_chunked",
    // e11's trailing-hour features through [[WindowChunk.trailingRange]]
    // — the hot-key-proof plan: the per-user RANGE window is chunked
    // along the ORDER axis (hour buckets, previous bucket's tail
    // duplicated in as non-emitting context), so one hot user's
    // history spreads over |range|/chunk tasks instead of serializing
    // into one. Row-identical to e11 by construction; the shared
    // oracle hash-checks exactly that. Same portability pins as e11
    // (floored epoch seconds, exact integer cents).
    (s, d) => {
      val base = events(s, d)
        .select(col("user_id"), col("event_id"),
          col("ts").cast("long").as("__tsec"),
          round(col("value") * 100, 0).cast("long").as("__vc"))
      graft.operators.WindowChunk.trailingRange(
          base, Seq("user_id"), "__tsec", lookback = 3600L,
          aggs = Seq((count(lit(1)), "n_1h"),
            (sum(col("__vc")), "sum_cents_1h")))
        .select(col("user_id"), col("event_id"),
          col("n_1h"), col("sum_cents_1h"))
        .orderBy("user_id", "event_id")
    },
    Some(rollingFeaturesSql))

  private val e13 = QuerySpec("e13_rolling_features_auto",
    // The skew-aware dispatch over e11/e12's choice
    // ([[WindowChunk.trailingRangeAuto]], the q6/q7 hot/cold idiom
    // applied to windows): measure the per-user row histogram in one
    // counts-only pass, then run the plain window (no chunk tax) when
    // no key exceeds the hot threshold, the chunked plan when one
    // does. The synthetic events table is unskewed, so the chooser
    // picks the PLAIN plan here — which the shared e11 oracle
    // hash-checks; WindowChunkSpec pins the hot branch (plan shape +
    // row identity) and the threshold boundary. An operator gets the
    // hot-key insurance without knowing their key distribution.
    (s, d) => {
      val base = events(s, d)
        .select(col("user_id"), col("event_id"),
          col("ts").cast("long").as("__tsec"),
          round(col("value") * 100, 0).cast("long").as("__vc"))
      graft.operators.WindowChunk.trailingRangeAuto(
          base, Seq("user_id"), "__tsec", lookback = 3600L,
          aggs = Seq((count(lit(1)), "n_1h"),
            (sum(col("__vc")), "sum_cents_1h")))
        .select(col("user_id"), col("event_id"),
          col("n_1h"), col("sum_cents_1h"))
        .orderBy("user_id", "event_id")
    },
    Some(rollingFeaturesSql))

  final def queriesEvents: Seq[QuerySpec] =
    Seq(e1, e2, e3, e4, e5, e6, e7, e8, e9, e10, e11, e12, e13)
}
