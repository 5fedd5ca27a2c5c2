package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-proof trailing-RANGE window aggregation (the e11 rolling-
  * feature shape hardened for hot keys).
  *
  * A plain `Window.partitionBy(user).orderBy(t).rangeBetween(-L, 0)`
  * puts EVERY row of a partition key into one task — correct until one
  * key is hot (a bot account, a default/null user, a headless service
  * identity), at which point a 100 TB job ships that key's entire
  * history through a single sort on a single core while the rest of
  * the cluster idles. Salting does not apply: a window's frame is a
  * function of the whole partition, so splitting a key arbitrarily
  * changes the answer.
  *
  * For BOUNDED trailing frames the partition is splittable along the
  * ORDER axis instead: chunk the order key into buckets of length
  * `chunkLen >= lookback`, so every row's frame
  * `[t - lookback, t]` spans at most its own bucket and the one
  * before. Each (key, bucket) partition gets its own rows plus the
  * TAIL of the previous bucket (only rows within `lookback` of the
  * bucket boundary) duplicated in as context: context rows
  * contribute to frames but their own outputs are dropped, own rows
  * emit exactly once. The hot key's history now spreads over
  * |range| / chunkLen tasks, the exchange grows by at most the
  * context fraction (lookback / chunkLen of the data, worst case),
  * and the result is row-identical to the plain window — RANGE peers
  * (equal order values) always share a bucket, so tie frames are
  * preserved exactly.
  *
  * This is the window analogue of salted aggregation: correct by
  * construction for any frame-bounded aggregate (the frame never
  * reaches further back than `lookback`), NOT applicable to unbounded
  * or leading frames. The order key is an integer (epoch seconds,
  * sequence number); buckets are floor-divisions of it, so negative
  * keys chunk correctly.
  */
object WindowChunk {

  /** Evaluate trailing-RANGE aggregates `aggs` (aggregate expression →
    * output column name) over `[orderCol - lookback, orderCol]` per
    * `partCols`, chunked along the order axis so no single (hot) key
    * serializes into one task. Returns `df`'s columns plus the named
    * aggregate outputs, one row per input row — row-identical to
    * `agg.over(Window.partitionBy(partCols).orderBy(orderCol)
    * .rangeBetween(-lookback, 0))`.
    *
    * `chunkLen` defaults to `lookback` (every previous-bucket row is
    * context); a larger chunk trades parallelism for a smaller
    * context fraction (`lookback / chunkLen`). Rows with a null order
    * key are refused loudly: a plain window sorts them first where
    * they'd poison every frame silently, and no trailing frame is
    * well-defined for them. */
  def trailingRange(df: DataFrame, partCols: Seq[String], orderCol: String,
                    lookback: Long, aggs: Seq[(Column, String)],
                    chunkLen: Long = 0L): DataFrame = {
    requireArgs(partCols, lookback, aggs)
    val cl = if (chunkLen > 0L) chunkLen else math.max(lookback, 1L)
    require(cl >= lookback,
      s"chunkLen $cl < lookback $lookback — a frame could span more than " +
        "two buckets and context rows would be missing from it")
    val guarded = guardOrder(df, orderCol)
    // exact long floor-division bucket (pmod keeps negatives correct;
    // no double round-trip, so huge sequence-number keys stay exact)
    val bucket = expr(s"(__wc_o - pmod(__wc_o, ${cl}L)) div ${cl}L")
    val own = guarded.withColumn("__wc_bucket", bucket)
      .withColumn("__wc_ctx", lit(false))
    // previous-bucket tail: only rows within `lookback` of the NEXT
    // bucket's start can appear in a next-bucket row's frame
    val ctx = guarded
      .filter(pmod(col("__wc_o"), lit(cl)) >= lit(cl - lookback))
      .withColumn("__wc_bucket", bucket + 1)
      .withColumn("__wc_ctx", lit(true))
    val w = Window
      .partitionBy((partCols :+ "__wc_bucket").map(col): _*)
      .orderBy(col("__wc_o"))
      .rangeBetween(-lookback, 0)
    own.unionByName(ctx)
      .select(df.columns.map(col) ++
        Seq(col("__wc_ctx")) ++
        aggs.map { case (a, name) => a.over(w).as(name) }: _*)
      .filter(!col("__wc_ctx"))
      .drop("__wc_ctx")
  }

  /** The largest per-key row count — the number that decides whether a
    * per-key window plan serializes one key's history into one task.
    * One narrow pass with a counts-only, map-side-combinable exchange
    * (≤ |distinct keys| rows move); exact rather than sampled, because
    * a moderately hot key that sampling misses is exactly the one that
    * hurts. 0 for an empty frame. */
  def maxKeyRows(df: DataFrame, partCols: Seq[String]): Long = {
    require(partCols.nonEmpty, "maxKeyRows needs at least one key column")
    df.groupBy(partCols.map(col): _*).count()
      .agg(coalesce(max("count"), lit(0L))).collect()(0).getLong(0)
  }

  /** Skew-aware dispatch — the q6/q7 hot/cold-split idiom applied to
    * windows: measure the key histogram ([[maxKeyRows]]) and pick the
    * plan, so an operator need not know their key distribution in
    * advance. Keys at most `hotKeyThreshold` rows deep run the PLAIN
    * per-key RANGE window (no context duplication, no ~2× chunk tax —
    * the round-14 measurement); anything hotter runs [[trailingRange]]
    * (the hot key's sort spreads over |range|/chunkLen tasks instead
    * of one). Both branches produce row-identical output and REFUSE
    * null order keys loudly (the plain branch carries the same guard,
    * so the chooser never changes semantics — only the plan).
    *
    * The default threshold (1M rows) is the round-14 probe's pain
    * point: one task sorting a 1M-row hot key cost ~2× the whole
    * chunked plan. The chooser pass itself is a counts-only scan —
    * at scale it is priced well under the window's own sort, and it
    * runs BEFORE the shuffle, so a hot key never reaches a single
    * task unmeasured. */
  def trailingRangeAuto(df: DataFrame, partCols: Seq[String],
                        orderCol: String, lookback: Long,
                        aggs: Seq[(Column, String)],
                        hotKeyThreshold: Long = 1000000L,
                        chunkLen: Long = 0L): DataFrame = {
    requireArgs(partCols, lookback, aggs)
    require(hotKeyThreshold >= 1, s"hotKeyThreshold $hotKeyThreshold must be >= 1")
    // chunkLen is validated EAGERLY even though only the chunked
    // branch uses it: a config error must fail on every call, not
    // months later on the first day the data turns skewed
    val cl = if (chunkLen > 0L) chunkLen else math.max(lookback, 1L)
    require(cl >= lookback,
      s"chunkLen $cl < lookback $lookback — a frame could span more than " +
        "two buckets and context rows would be missing from it")
    if (maxKeyRows(df, partCols) > hotKeyThreshold)
      trailingRange(df, partCols, orderCol, lookback, aggs, chunkLen)
    else {
      val guarded = guardOrder(df, orderCol)
      val w = Window.partitionBy(partCols.map(col): _*)
        .orderBy(col("__wc_o")).rangeBetween(-lookback, 0)
      guarded.select(df.columns.map(col) ++
        aggs.map { case (a, name) => a.over(w).as(name) }: _*)
    }
  }

  private def requireArgs(partCols: Seq[String], lookback: Long,
                          aggs: Seq[(Column, String)]): Unit = {
    require(partCols.nonEmpty, "trailingRange needs at least one partition column")
    require(lookback >= 0, s"lookback $lookback must be >= 0")
    require(aggs.nonEmpty, "trailingRange needs at least one aggregate")
  }

  private def guardOrder(df: DataFrame, orderCol: String): DataFrame = {
    val o = col(orderCol)
    df.withColumn("__wc_o",
      when(o.isNull, raise_error(
        lit(s"trailingRange: null order key in $orderCol — no trailing " +
          "frame is defined for it")))
        .otherwise(o.cast("long")))
  }
}
