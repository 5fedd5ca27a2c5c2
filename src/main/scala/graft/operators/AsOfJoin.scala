package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (last-value-before) join — the temporal join Spark lacks as a
  * built-in, shaped for scale (north-star training-pipeline operator:
  * attach the latest prior measurement/label/price to every event).
  *
  * NOT implemented as a range join (`l.ts >= r.ts` theta-join explodes
  * to O(|L|·|R|) per key before aggregation). Instead the classic
  * union trick: tag both sides, union, and take
  * `last(value, ignoreNulls)` over a (key)-partitioned window ordered
  * by (ts, side) with rows from the beginning — right rows sort BEFORE
  * left rows at equal timestamps, so `r.ts <= l.ts` (inclusive)
  * semantics fall out of the sort order. ONE shuffle of L∪R by key,
  * one sort, zero joins — the plan a 100 TB event table wants.
  *
  * Ties: if the right side can hold several rows per (key, ts) the
  * result would be order-dependent; pre-aggregate the right side to
  * one row per (key, ts) (as the e5 harness query does with max) —
  * the same determinism contract DuckDB's native ASOF JOIN has.
  */
object AsOfJoin {

  /** For each left row: all left columns + `outCol` = the right
    * side's `valCol` from the latest right row with
    * `right.tsCol <= left.tsCol`, per `keyCol` (null when no prior
    * right row exists — left-join semantics). A matched right row
    * whose value IS null yields null (the matched row wins; an older
    * non-null value is NOT substituted — same as a native ASOF join):
    * the value travels inside a non-null single-field struct, so
    * `last(_, ignoreNulls)` tracks the latest right ROW, not the
    * latest non-null value. Timestamps compare in whatever
    * (consistent) domain the caller supplies. Temp names `__key __ts
    * __side __v __row` and `outCol` must not collide with input
    * columns (checked). */
  def lastBefore(left: DataFrame, right: DataFrame, keyCol: String,
                 ltsCol: String, rtsCol: String, valCol: String,
                 outCol: String = "asof_value"): DataFrame = {
    val temps = Set("__key", "__ts", "__side", "__v", "__row")
    val clash = (left.columns ++ right.columns).toSet
      .intersect(temps + outCol)
    require(clash.isEmpty, s"input columns collide with temp names: $clash")
    require(!temps.contains(outCol), s"outCol $outCol is a reserved temp name")
    val valType = right.schema(valCol).dataType
    val boxType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v", valType)))
    val lt = left.select(
      col(keyCol).as("__key"),
      col(ltsCol).as("__ts"),
      lit(1).as("__side"),
      lit(null).cast(boxType).as("__v"),
      struct(left.columns.map(col): _*).as("__row"))
    // native-ASOF key semantics: a NULL key never matches — null-key
    // right rows are dropped (they could otherwise pair with null-key
    // left rows via the window's null-grouping); null-key LEFT rows
    // still emit, with a null as-of value, preserving left-join shape.
    val rt = right.filter(col(keyCol).isNotNull).select(
      col(keyCol).as("__key"),
      col(rtsCol).as("__ts"),
      lit(0).as("__side"),
      struct(col(valCol).cast(valType).as("v")).as("__v"))
      .withColumn("__row", lit(null).cast(lt.schema("__row").dataType))
    val w = Window.partitionBy("__key")
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    lt.unionByName(rt)
      .withColumn(outCol,
        last(col("__v"), ignoreNulls = true).over(w).getField("v"))
      .filter(col("__side") === 1)
      .select(col("__row.*"), col(outCol))
  }
}
