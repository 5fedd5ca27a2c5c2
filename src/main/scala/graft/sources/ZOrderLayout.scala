package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
  * Each column gets a RANK in [0, 2^bits) whose derivation is
  * type-dispatched ([[ZRank]]) and validated LOUDLY up front — the
  * round-17 draft cast everything to double, so a string column
  * silently ranked constant 0 (that dimension contributed NOTHING to
  * clustering) and a date column died in a raw cast error:
  *
  *  - numeric / boolean → equal-WIDTH buckets over the observed
  *    [min, max] ([[ZRank.Width]]): one tiny layout-time aggregate,
  *    and the rank stays a static codegen'd `width_bucket` — no
  *    quantile table. Skew costs only pruning efficiency on the
  *    skewed dimension, never correctness; for heavy-tailed columns
  *    the opt-in equal-DEPTH rank ([[ZRank.Depth]], from
  *    `approx_percentile` at layout time) spreads rows evenly across
  *    buckets at the price of an `aggregate` HOF per row in the
  *    layout job only.
  *  - date / timestamp → the same, over the epoch-seconds cast.
  *  - string → a DICTIONARY rank ([[ZRank.Dict]]): the sorted
  *    distinct values (bounded by [[MaxDictValues]], loud refusal
  *    past it) map to equal-depth-by-value buckets via one literal
  *    map lookup, preserving lexicographic order so per-file min/max
  *    on the string column itself stays tight — equality AND range
  *    predicates on a tenant/language dimension prune. High-cardinality
  *    strings are refused by design: hash-bucketing them would
  *    scatter lexicographic order and leave min/max useless.
  *  - anything else (map/array/struct/binary) → loud refusal naming
  *    the column, never a silent no-op dimension.
  *
  * Nulls rank as bucket 0 — they cluster together at the curve's
  * origin. Results are layout-independent by construction: the
  * written table holds exactly the input rows (row-identity
  * spec-pinned; the j3 harness query hash-checks a 2-D filter
  * against DuckDB over the ORIGINAL table).
  */
object ZOrderLayout {

  /** Dictionary-rank cardinality bound. Past this a string column is
    * not a clustering dimension (the rank map is a per-row literal
    * lookup and the layout-time distinct is driver-collected) — use a
    * numeric surrogate key instead. */
  val MaxDictValues = 4096

  /** A column's rank derivation: layout-time statistics plus the
    * static expression mapping a value to [0, 2^bits). Pure data —
    * [[ZStore]] serializes ranks into the layout's `_zmeta.json` so
    * absorbed batches rank against the SAME envelopes the base layout
    * used. */
  sealed trait ZRank {
    /** Rank `input` (already type-normalized by [[rankInput]]) to a
      * long in [0, 2^bits). Total: nulls and out-of-envelope values
      * clamp, never error — an absorbed batch may carry values the
      * layout-time statistics never saw. */
    def rank(input: Column, bits: Int): Column

    /** True for a row whose value falls OUTSIDE this rank's
      * layout-time envelope (clamped at [[rank]] time): the
      * envelope-drift signal [[ZStore.absorb]] reports. Nulls are
      * in-envelope (they rank 0 by design, not by clamping). */
    def outOfEnvelope(input: Column): Column

    /** The CONSERVATIVE rank interval that covers every data value in
      * [lo, hi] — the driver-side mirror of [[rank]] that
      * manifest-level bucket pruning ([[ZStore.readRange]]) needs:
      * the returned interval may be wider than exact (costs a few
      * extra buckets) but must NEVER be narrower (a dropped bucket is
      * wrong results, not slow results). Width pads ±1 rank against
      * floating-point boundary disagreement with Spark's
      * `width_bucket`; Depth and Dict mirror their rank arithmetic
      * exactly (pure comparisons). None = no value can match
      * (an empty dict slice with no clamped mass). */
    def rankInterval(lo: Any, hi: Any, bits: Int): Option[(Long, Long)]
  }

  object ZRank {
    /** Equal-width buckets over the observed [min, max]; degenerate
      * (all-null or single-valued) columns rank constant 0. */
    final case class Width(min: Double, max: Double) extends ZRank {
      def rank(input: Column, bits: Int): Column = {
        val nBuckets = 1L << bits
        if (!(max > min)) lit(0L)
        // width_bucket returns [1, nBuckets+1], shift to [0, nBuckets-1]
        else least(lit(nBuckets - 1), greatest(lit(0L),
          coalesce(width_bucket(input, lit(min), lit(max),
            lit(nBuckets.toInt)).cast("long") - 1L, lit(0L))))
      }
      def outOfEnvelope(input: Column): Column =
        if (!(max > min)) input.isNotNull && (input =!= lit(min))
        else input.isNotNull && (input < lit(min) || input > lit(max))

      /** Scalar mirror of the `width_bucket` rank (same clamp
        * algebra), for query BOUNDS. */
      private def rankValue(v: Double, bits: Int): Long = {
        val nBuckets = 1L << bits
        if (!(max > min)) 0L
        else {
          val wb =
            if (v < min) 0L
            else if (v >= max) nBuckets + 1L
            else ((v - min) / (max - min) * nBuckets).toLong + 1L
          math.min(nBuckets - 1, math.max(0L, wb - 1L))
        }
      }

      def rankInterval(lo: Any, hi: Any, bits: Int): Option[(Long, Long)] = {
        val (l, h) = (toD(lo), toD(hi))
        val nBuckets = 1L << bits
        // ±1 pad: the scalar mirror and Spark's codegen'd width_bucket
        // can disagree by one bucket at FP boundaries — pruning must
        // err wide. Out-of-envelope query bounds clamp exactly like
        // out-of-envelope DATA does (monotone rank), so clamped rows
        // are found without special cases.
        Some((math.max(0L, rankValue(l, bits) - 1),
          math.min(nBuckets - 1, rankValue(h, bits) + 1)))
      }
    }

    private def toD(v: Any): Double = v match {
      case d: Double => d
      case f: Float => f.toDouble
      case n: Number => n.doubleValue()
      case b: Boolean => if (b) 1.0 else 0.0
      case other => throw new IllegalArgumentException(
        s"numeric range bound expected, got $other " +
          s"(${other.getClass.getSimpleName}) — cast temporal bounds to " +
          "epoch-seconds doubles at the call site")
    }

    /** Equal-depth buckets: `bounds` are the nBuckets−1 ascending
      * interior boundaries from `approx_percentile` at layout time;
      * rank = number of boundaries the value is ≥. The rank is an
      * `aggregate` HOF over a literal array — not codegen'd, so it is
      * priced into the one-time layout job, never the read path.
      * `lo`/`hi` carry the observed [min, max] SEPARATELY from the
      * interior bounds: values beyond the first/last percentile rank
      * into the edge buckets BY DESIGN (that is what equal depth
      * means), so the drift envelope must be the observed extremes —
      * flagging the outer 2/nBuckets of identical data as "clamped"
      * would make every healthy absorb look like drift (caught by
      * ZStoreSpec's identical-re-absorb pin). */
    final case class Depth(bounds: Seq[Double], lo: Double,
                           hi: Double) extends ZRank {
      def rank(input: Column, bits: Int): Column = {
        require(bounds.length == (1 << bits) - 1,
          s"Depth rank needs ${(1 << bits) - 1} bounds for bits=$bits, " +
            s"got ${bounds.length}")
        when(input.isNull, 0L).otherwise(
          aggregate(typedlit(bounds), lit(0L),
            (acc, b) => acc + when(input >= b, 1L).otherwise(0L)))
      }
      def outOfEnvelope(input: Column): Column =
        input.isNotNull && (input < lit(lo) || input > lit(hi))

      def rankInterval(qLo: Any, qHi: Any, bits: Int): Option[(Long, Long)] = {
        require(bounds.length == (1 << bits) - 1,
          s"Depth rank needs ${(1 << bits) - 1} bounds for bits=$bits, " +
            s"got ${bounds.length}")
        // exact mirror of the aggregate-HOF rank: count of interior
        // bounds <= value (pure comparisons — no FP pad needed)
        def rv(v: Double): Long = bounds.count(v >= _).toLong
        Some((rv(toD(qLo)), rv(toD(qHi))))
      }
    }

    /** Dictionary rank for strings: `values` is the SORTED distinct
      * value list at layout time; each value maps to
      * floor(idx · nBuckets / n) — equal depth by distinct value,
      * lexicographic order preserved. Unseen values (absorbed later)
      * clamp to bucket 0, disclosed via [[outOfEnvelope]]. */
    final case class Dict(values: Seq[String]) extends ZRank {
      def rank(input: Column, bits: Int): Column = {
        val nBuckets = 1L << bits
        val n = math.max(values.length, 1)
        val m = values.zipWithIndex.map { case (v, i) =>
          v -> (i.toLong * nBuckets / n)
        }.toMap
        if (m.isEmpty) lit(0L)
        else coalesce(element_at(typedlit(m), input), lit(0L))
      }
      def outOfEnvelope(input: Column): Column =
        if (values.isEmpty) input.isNotNull
        else input.isNotNull && !input.isin(values: _*)

      /** Lexicographic slice of the SORTED dictionary: rankLo = rank
        * of the first value >= qLo, rankHi = rank of the last value
        * <= qHi (exact — the rank map is the same integer formula).
        * None when no dictionary value falls in [qLo, qHi] — but the
        * CALLER must still include rank 0 when the store has absorbed
        * out-of-dictionary values (they clamp to 0 NON-monotonically,
        * unlike the numeric ranks), which is [[graft.sources.ZStore]]'s
        * clamp-counter's job to know. */
      def rankInterval(qLo: Any, qHi: Any, bits: Int): Option[(Long, Long)] = {
        val (l, h) = (qLo.toString, qHi.toString)
        val nBuckets = 1L << bits
        val n = math.max(values.length, 1)
        def rankOf(idx: Int): Long = idx.toLong * nBuckets / n
        val from = values.indexWhere(_ >= l)
        val to = values.lastIndexWhere(_ <= h)
        if (from < 0 || to < 0 || from > to) None
        else Some((rankOf(from), rankOf(to)))
      }
    }
  }

  /** The type-normalized rank input for `c`: numeric/boolean cast to
    * double, date/timestamp cast through timestamp to epoch-seconds
    * double, string passed through for the dictionary lookup.
    * [[validateZColumns]] has already refused everything else. */
  private[graft] def rankInput(dt: DataType, c: String): Column = dt match {
    case _: NumericType | BooleanType => col(c).cast("double")
    case DateType | _: TimestampType | TimestampNTZType =>
      col(c).cast("timestamp").cast("double")
    case StringType => col(c)
    case other => throw new IllegalArgumentException(
      s"zorder column `$c` has unsupported type ${other.simpleString}")
  }

  /** Loud up-front validation: every layout column must exist and be
    * numeric, boolean, date/timestamp, or string — a dimension that
    * cannot rank must refuse by NAME, never silently contribute
    * nothing to the clustering. Returns the columns' data types. */
  private[graft] def validateZColumns(df: DataFrame,
                                      cols: Seq[String]): Seq[DataType] = {
    require(cols.nonEmpty, "zorder needs at least one column")
    cols.map { c =>
      val f = df.schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(
          s"zorder column $c not in ${df.columns.mkString(", ")}"))
      f.dataType match {
        case _: NumericType | BooleanType | DateType |
             _: TimestampType | TimestampNTZType | StringType => f.dataType
        case other => throw new IllegalArgumentException(
          s"zorder column `$c` has type ${other.simpleString} — only " +
            "numeric, boolean, date/timestamp, and string columns can " +
            "rank onto the curve (map/array/struct/binary have no " +
            "ordering parquet min/max statistics could prune by)")
      }
    }
  }

  /** Derive each column's [[ZRank]] from the data — the layout-time
    * statistics pass. Numeric/temporal columns take ONE aggregate
    * over the table (min/max, or `approx_percentile` when
    * `equalDepth`); each string column additionally pays a bounded
    * distinct-collect (refused past [[MaxDictValues]]). `equalDepth`
    * applies to the numeric/temporal dimensions only — strings are
    * always equal-depth by distinct value. */
  def columnRanks(df: DataFrame, cols: Seq[String], bits: Int,
                  equalDepth: Boolean = false): Seq[ZRank] = {
    require(bits >= 1 && bits <= 12,
      s"bits $bits must be in [1, 12] for rank derivation " +
        "(2^bits buckets per dimension)")
    val types = validateZColumns(df, cols)
    val numericCols = cols.zip(types).filter(_._2 != StringType)
    val nBuckets = 1 << bits
    val numericRanks: Map[String, ZRank] =
      if (numericCols.isEmpty) Map.empty
      else if (!equalDepth) {
        val aggs = numericCols.flatMap { case (c, dt) =>
          val in = rankInput(dt, c)
          Seq(min(in), max(in))
        }
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        numericCols.zipWithIndex.map { case ((c, _), i) =>
          c -> (ZRank.Width(
            if (row.isNullAt(2 * i)) 0.0 else row.getDouble(2 * i),
            if (row.isNullAt(2 * i + 1)) 0.0 else row.getDouble(2 * i + 1))
            : ZRank)
        }.toMap
      } else {
        val ps = (1 until nBuckets).map(_.toDouble / nBuckets)
        val aggs = numericCols.flatMap { case (c, dt) =>
          val in = rankInput(dt, c)
          Seq(percentile_approx(in, typedlit(ps), lit(10000)),
            min(in), max(in))
        }
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        numericCols.zipWithIndex.map { case ((c, _), i) =>
          val bounds =
            if (row.isNullAt(3 * i)) Seq.fill(nBuckets - 1)(0.0)
            else row.getSeq[Double](3 * i)
          val lo = if (row.isNullAt(3 * i + 1)) 0.0 else row.getDouble(3 * i + 1)
          val hi = if (row.isNullAt(3 * i + 2)) 0.0 else row.getDouble(3 * i + 2)
          c -> (ZRank.Depth(bounds, lo, hi): ZRank)
        }.toMap
      }
    cols.zip(types).map {
      case (c, StringType) =>
        val vals = df.select(col(c)).na.drop().distinct()
          .limit(MaxDictValues + 1)
          .collect().map(_.getString(0)).sorted.toSeq
        require(vals.length <= MaxDictValues,
          s"zorder string column `$c` has more than $MaxDictValues " +
            "distinct values — a high-cardinality string is not a " +
            "clustering dimension; use a numeric surrogate instead")
        ZRank.Dict(vals)
      case (c, _) => numericRanks(c)
    }
  }

  /** The Morton key over type-dispatched ranks: each column ranked to
    * a `bits`-wide integer, then bit-interleaved (column i owns bit
    * positions i, i+n, i+2n, …). With [[ZRank.Width]]/[[ZRank.Dict]]
    * this is a static expression of bits × n_cols shifts/ors —
    * whole-stage-codegen'd, no UDF, no side table. */
  def zorderKey(df: DataFrame, cols: Seq[String], ranks: Seq[ZRank],
                bits: Int): Column = {
    require(cols.nonEmpty, "zorderKey needs at least one column")
    require(ranks.length == cols.length,
      s"ranks (${ranks.length}) must match cols (${cols.length})")
    // the joint bound keeps the interleaved key inside a long; the
    // 2^bits-sized derivations (Depth bounds, Dict) are capped where
    // they are DERIVED (columnRanks, <= 12) and re-checked inside each
    // rank's own length guard — a Width-ranked key is pure arithmetic
    // and stays valid up to 30 bits per dimension
    require(bits >= 1 && bits <= 30 && bits * cols.length <= 62,
      s"bits $bits must be in [1, 30] and bits x ${cols.length} cols " +
        "must fit a long (<= 62 bits)")
    val types = validateZColumns(df, cols)
    val n = cols.length
    val rankCols = cols.lazyZip(types).lazyZip(ranks).map {
      case (c, dt, r) => r.rank(rankInput(dt, c), bits)
    }
    interleave(rankCols, bits, n)
  }

  /** Backward-compatible numeric form: per-column (min, max) pairs as
    * equal-width ranks over `cast(c as double)` (pre-round-18
    * signature AND domain — bits up to 30 stays valid here, because
    * the Width rank is pure arithmetic with no 2^bits-sized
    * derivation; only [[columnRanks]] caps bits at 12, for the
    * Depth/Dict bound and dictionary sizes it materializes). */
  def zorderKey(cols: Seq[String], stats: Seq[(Double, Double)],
                bits: Int): Column = {
    require(cols.nonEmpty, "zorderKey needs at least one column")
    require(stats.length == cols.length,
      s"stats (${stats.length}) must match cols (${cols.length})")
    require(bits >= 1 && bits <= 30 && bits * cols.length <= 62,
      s"bits $bits must be in [1, 30] and bits x ${cols.length} cols " +
        "must fit a long (<= 62 bits)")
    val ranks = cols.zip(stats).map { case (c, (mn, mx)) =>
      ZRank.Width(mn, mx).rank(col(c).cast("double"), bits)
    }
    interleave(ranks, bits, cols.length)
  }

  private def interleave(ranks: Seq[Column], bits: Int, n: Int): Column =
    (for { j <- 0 until bits; i <- 0 until n } yield
      shiftleft(shiftright(ranks(i), j).bitwiseAND(lit(1L)), j * n + i))
      .reduce(_ bitwiseOR _)

  /** Per-column (min, max) over `cols` — the equal-width numeric
    * statistics pass (2 × n_cols doubles cross the driver). Columns
    * must be numeric/boolean/temporal; use [[columnRanks]] for the
    * type-dispatched form that also handles strings. */
  def columnStats(df: DataFrame, cols: Seq[String]): Seq[(Double, Double)] = {
    val types = validateZColumns(df, cols)
    types.zip(cols).foreach { case (dt, c) =>
      require(dt != StringType,
        s"columnStats is the numeric statistics pass — string column " +
          s"`$c` needs columnRanks' dictionary rank")
    }
    val aggs = cols.zip(types).flatMap { case (c, dt) =>
      val in = rankInput(dt, c)
      Seq(min(in), max(in))
    }
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
    * filter that reads the table afterwards. `equalDepth` opts the
    * numeric dimensions into percentile ranks for heavy-tailed
    * columns (see [[columnRanks]]) — rule of thumb from the 60M skew
    * probe (PLANS.md round 18): default equal-width; flip this when a
    * clustered column's p99/p50 spans decades (there the query BODY
    * ranks into a couple of width buckets and that dimension stops
    * pruning — measured 7.6× more recordsRead on a body predicate),
    * and pay the ~10× slower one-time layout job (the percentile rank
    * is a non-codegen HOF; the read path is identical either way).
    * This is the WRITE-ONCE form; for
    * a layout that must absorb appended batches without diluting its
    * per-file envelopes, use [[ZStore]]. */
  def writeZOrdered(df: DataFrame, cols: Seq[String], path: String,
                    nFiles: Int, bits: Int = 8,
                    equalDepth: Boolean = false): Unit = {
    require(nFiles >= 1, s"nFiles $nFiles must be >= 1")
    val ranks = columnRanks(df, cols, bits, equalDepth)
    df.withColumn("__zkey", zorderKey(df, cols, ranks, bits))
      .repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
  }
}
