package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) table layout — multi-column scan pruning as
  * a LAYOUT property, the missing sibling of [[BucketedLayout]]'s
  * join co-location (reference analog: the persisted store queries
  * serve from without re-ingesting, `build_vectorstore.py:242`,
  * applied to the relational tables' filter axis).
  *
  * Why a layout at all: parquet readers skip row groups whose
  * column min/max statistics exclude a pushed filter — but statistics
  * only exclude anything when similar values sit TOGETHER. A table
  * sorted by one column prunes predicates on that column and nothing
  * else; real pipeline predicates are multi-dimensional (tenant ×
  * time, language × quality score, price × quantity). The Z-order
  * key interleaves the bits of several columns' rank so rows close
  * in EVERY dimension land in the same files: each dimension's
  * per-file min/max span shrinks roughly by file_count^(1/n_cols)
  * instead of one dimension taking the whole win (Morton 1966; the
  * same trade behind Delta/Iceberg table optimization). At 100 TB
  * the effect is that a selective 2-D predicate decodes the row
  * groups of a few files instead of paging every file's worth of
  * data through the scan.
  *
  * The key is equal-WIDTH bucketing of each column over its observed
  * [min, max] (one tiny aggregate at layout time), not equal-depth:
  * width buckets keep the expression a static codegen'd arithmetic
  * over the row (no quantile table to broadcast), and skew costs
  * only pruning efficiency on the skewed dimension, never
  * correctness. Nulls rank as bucket 0 — they cluster together at
  * the curve's origin. Results are layout-independent by
  * construction: the written table holds exactly the input rows
  * (row-identity spec-pinned; the j3 harness query hash-checks a
  * 2-D filter against DuckDB over the ORIGINAL table).
  */
object ZOrderLayout {

  /** The Morton key: each column ranked to a `bits`-wide integer via
    * width_bucket over [min, max], then bit-interleaved (column i
    * owns bit positions i, i+n, i+2n, …). A static expression of
    * bits × n_cols shifts/ors — whole-stage-codegen'd, no UDF, no
    * side table. `stats` carries (min, max) per column in `cols`
    * order, from [[columnStats]]. */
  def zorderKey(cols: Seq[String], stats: Seq[(Double, Double)],
                bits: Int): Column = {
    require(cols.nonEmpty, "zorderKey needs at least one column")
    require(stats.length == cols.length,
      s"stats (${stats.length}) must match cols (${cols.length})")
    // bits <= 30 keeps nBuckets an exact Int for width_bucket (a
    // larger value would overflow to a non-positive bucket count,
    // which width_bucket maps to NULL → every rank 0 → a constant
    // key and NO clustering, silently); the joint bound keeps the
    // interleaved key inside a long
    require(bits >= 1 && bits <= 30 && bits * cols.length <= 62,
      s"bits $bits must be in [1, 30] and bits x ${cols.length} cols " +
        "must fit a long (<= 62 bits)")
    val n = cols.length
    val nBuckets = 1L << bits
    val ranks = cols.zip(stats).map { case (c, (mn, mx)) =>
      // degenerate column (all one value, or all null) → bucket 0;
      // width_bucket returns [1, nBuckets+1], shift to [0, nBuckets-1]
      if (!(mx > mn)) lit(0L)
      else least(lit(nBuckets - 1), greatest(lit(0L),
        coalesce(width_bucket(col(c).cast("double"), lit(mn), lit(mx),
          lit(nBuckets.toInt)).cast("long") - 1L, lit(0L))))
    }
    (for { j <- 0 until bits; i <- 0 until n } yield
      shiftleft(shiftright(ranks(i), j).bitwiseAND(lit(1L)), j * n + i))
      .reduce(_ bitwiseOR _)
  }

  /** Per-column (min, max) over `cols` — the one layout-time
    * aggregate the key needs; 2 × n_cols doubles cross the driver. */
  def columnStats(df: DataFrame, cols: Seq[String]): Seq[(Double, Double)] = {
    require(cols.nonEmpty, "columnStats needs at least one column")
    val aggs = cols.flatMap(c => Seq(
      expr(s"min(cast(`$c` as double))"),
      expr(s"max(cast(`$c` as double))")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.indices.map(i =>
      (if (row.isNullAt(2 * i)) 0.0 else row.getDouble(2 * i),
       if (row.isNullAt(2 * i + 1)) 0.0 else row.getDouble(2 * i + 1)))
  }

  /** Write `df` Z-ordered on `cols` into ~`nFiles` files: rank →
    * interleave → range-repartition on the key (contiguous curve
    * segments per file) → sort within each file → write WITHOUT the
    * key column (the layout is the artifact; the schema stays the
    * input's, so readers and oracles are layout-blind). One full
    * exchange at layout time — the same pay-once trade as
    * [[BucketedLayout.writeBucketed]] and the index store's
    * one-file-per-cell default, amortized over every multi-column
    * filter that reads the table afterwards. */
  def writeZOrdered(df: DataFrame, cols: Seq[String], path: String,
                    nFiles: Int, bits: Int = 8): Unit = {
    require(nFiles >= 1, s"nFiles $nFiles must be >= 1")
    cols.foreach(c => require(df.columns.contains(c),
      s"zorder column $c not in ${df.columns.mkString(", ")}"))
    val stats = columnStats(df, cols)
    df.withColumn("__zkey", zorderKey(cols, stats, bits))
      .repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
  }
}
