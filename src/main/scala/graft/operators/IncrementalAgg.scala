package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate (materialized-view) maintenance over
  * algebraic metrics: keep per-group STATE (sum, count, min, max per
  * value column) instead of the rendered report, absorb a delta by
  * merging its state, and derive the report (including avg = sum/cnt)
  * from state alone. The relational twin of the t37 incremental
  * dataset card (operators/DatasetCard.absorb): a daily 100 TB
  * pipeline never re-reads the historical corpus to refresh its
  * rollups — it aggregates the day's delta (cost ∝ delta) and merges
  * |groups| state rows.
  *
  * All four statistics form commutative monoids (sum/count under +,
  * min/max under least/greatest), so merge order and batch boundaries
  * cannot change the result — the q12 oracle exploits exactly this:
  * DuckDB recomputes from the FULL table while Spark merges two
  * partial states, and the hash-compare proves merge ≡ recompute.
  * Non-algebraic metrics (exact quantiles, distinct counts) need the
  * sketch family instead (GK t25, HLL t24 — both mergeable too).
  *
  * 100 TB shape: [[partials]] is one map-side-combinable aggregate
  * over the delta (the exchange carries one state row per partition ×
  * group); [[merge]] unions state tables — |groups| rows each — and
  * re-aggregates; nothing ever shuffles the fact rows twice. Exact
  * sums: feed integer-valued columns (counts, money in cents) for
  * bit-exact merge ≡ recompute at any scale; fp sums are subject to
  * the usual fold-order last-bit drift.
  */
object IncrementalAgg {

  private def stateCols(vals: Seq[String]) =
    vals.flatMap(v => Seq(s"sum_$v", s"cnt_$v", s"min_$v", s"max_$v"))

  /** Per-group mergeable state for `vals` over `df`: sum_v, cnt_v
    * (non-null count), min_v, max_v. */
  def partials(df: DataFrame, keys: Seq[String],
               vals: Seq[String]): DataFrame = {
    require(keys.nonEmpty && vals.nonEmpty, "keys and vals must be non-empty")
    val aggs = vals.flatMap { v =>
      Seq(sum(col(v)).as(s"sum_$v"), count(col(v)).as(s"cnt_$v"),
        min(col(v)).as(s"min_$v"), max(col(v)).as(s"max_$v"))
    }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge state tables (any number, any order — the metrics are
    * commutative monoids): sum of sums, sum of counts, min of mins,
    * max of maxs per group. A group absent from one state simply
    * contributes nothing for it. */
  def merge(keys: Seq[String], vals: Seq[String],
            states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "need at least one state")
    states.foreach { st =>
      val missing = (keys ++ stateCols(vals)).filterNot(st.columns.contains)
      require(missing.isEmpty, s"state missing columns: $missing")
    }
    val aggs = vals.flatMap { v =>
      Seq(sum(col(s"sum_$v")).as(s"sum_$v"), sum(col(s"cnt_$v")).as(s"cnt_$v"),
        min(col(s"min_$v")).as(s"min_$v"), max(col(s"max_$v")).as(s"max_$v"))
    }
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Render the report from state: passthrough sums/counts/min/max
    * plus derived avg_v = sum_v / cnt_v (null when the group saw no
    * non-null value — never a divide-by-zero NaN). */
  def render(keys: Seq[String], vals: Seq[String],
             state: DataFrame): DataFrame = {
    val derived = vals.flatMap { v =>
      Seq(col(s"sum_$v"), col(s"cnt_$v"),
        when(col(s"cnt_$v") === 0, lit(null).cast("double"))
          .otherwise(col(s"sum_$v") / col(s"cnt_$v")).as(s"avg_$v"),
        col(s"min_$v"), col(s"max_$v"))
    }
    state.select((keys.map(col) ++ derived): _*)
  }
}
