package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range (band/interval) join: all (left, right) pairs with
  * |l.ts − r.ts| ≤ width, WITHOUT an equi key — the join Spark plans
  * as a BroadcastNestedLoopJoin (O(|L|·|R|) comparisons and a full
  * broadcast of one side) if written as a raw theta join.
  *
  * Bucketing both sides at `width` bounds the bucket distance of any
  * in-window pair to ≤1, so exploding the RIGHT side to its three
  * neighboring buckets {b−1, b, b+1} and equi-joining on the bucket
  * finds every candidate exactly ONCE (the pair meets only at the
  * left row's own bucket — no dedup pass needed), and the exact
  * |Δts| ≤ width filter runs on candidates only. One hash shuffle per
  * side on integer bucket keys; candidate count is bounded by
  * temporal density (rows per width-window), not |L|·|R|.
  *
  * Integer floor-division bucketing (pmod-based) — no double rounding
  * at epoch-micros magnitudes, correct for negative timestamps. Rows
  * with a NULL timestamp never pair (standard SQL join-key
  * semantics: their bucket is null, and null keys don't match). */
object RangeJoin {

  private def bucket(c: org.apache.spark.sql.Column, width: Long) =
    ((c - pmod(c, lit(width))) / lit(width)).cast("long")

  /** Columns of `left` and `right` must be disjoint (pre-alias). */
  def pairsWithin(left: DataFrame, right: DataFrame,
                  ltsCol: String, rtsCol: String, width: Long): DataFrame = {
    require(width > 0, "width must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"overlapping column names: $overlap")
    val clash = (left.columns ++ right.columns).toSet.intersect(Set("__bucket"))
    require(clash.isEmpty, "input columns collide with temp name __bucket")
    val lb = left.withColumn("__bucket", bucket(col(ltsCol), width))
    val rb = right.withColumn("__bucket",
      explode(array(bucket(col(rtsCol), width) - 1,
        bucket(col(rtsCol), width),
        bucket(col(rtsCol), width) + 1)))
    lb.join(rb, Seq("__bucket"))
      .filter(abs(col(ltsCol) - col(rtsCol)) <= width)
      .drop("__bucket")
  }
}
