package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation (100 TB posture; AQE's skew handling
  * covers joins, but a single hot GROUP BY key still lands on one
  * reducer — the classic corpus case is near-duplicate boilerplate
  * text, where one text_hash can carry millions of rows).
  *
  * Two-phase: salt the key with a per-row bucket, aggregate per
  * (key, salt) — spreading a hot key over `buckets` reducers — then
  * aggregate the partials. Only algebraic aggregates decompose this
  * way; the provided wrappers (count/sum/min/max) are the
  * decompositions.
  *
  * The salt is POSITION-based (`monotonically_increasing_id mod
  * buckets`), not a row-content hash, for two reasons that both bite
  * at scale: (1) the pathological hot key is usually MANY IDENTICAL
  * rows (boilerplate text), which a content hash sends to one salt —
  * no spread at all, exactly when salting is needed; (2) hashing
  * `struct(*)` forces every column through the scan, defeating column
  * pruning for a two-column aggregation. Which bucket a row lands in
  * never affects an algebraic aggregate's result, so the salt needs no
  * cross-run stability.
  */
object Salting {

  private[graft] def salt(buckets: Int) =
    pmod(monotonically_increasing_id(), lit(buckets.toLong))

  /** count(*) per key, skew-spread over `buckets` reducers. */
  def saltedCount(df: DataFrame, keyCols: Seq[String], buckets: Int,
                  outCol: String = "n"): DataFrame = {
    require(buckets > 0)
    df.withColumn("__salt", salt(buckets))
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum("__partial").as(outCol))
  }

  /** sum(valueCol) per key, skew-spread over `buckets` reducers. */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
                buckets: Int, outCol: String = "sum"): DataFrame = {
    require(buckets > 0)
    df.withColumn("__salt", salt(buckets))
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(sum(valueCol).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum("__partial").as(outCol))
  }

  /** Salted broadcast-side replication for a skewed join: replicate
    * the small side `buckets`× with an explicit salt column and salt
    * the big side's key, so one hot join key spreads over `buckets`
    * tasks. Returns (bigSalted, smallReplicated, saltedKeys). */
  def saltedJoinSides(big: DataFrame, small: DataFrame,
                      keyCols: Seq[String], buckets: Int)
      : (DataFrame, DataFrame, Seq[String]) = {
    require(buckets > 0)
    val bigSalted = big.withColumn("__salt", salt(buckets))
    val smallRep = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(buckets - 1L))))
    (bigSalted, smallRep, keyCols :+ "__salt")
  }
}
