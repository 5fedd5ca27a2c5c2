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
  * The salt hashes CALLER-SUPPLIED identity columns (`saltCols` — a
  * row id, line number, or any near-unique narrow key), which is the
  * only assignment that is simultaneously: (1) DETERMINISTIC per row —
  * a positional salt (monotonically_increasing_id / zipWithIndex) is
  * fetch-order-dependent, so a partial stage retry after executor loss
  * can re-salt rows differently and double-count or drop them in the
  * two-phase aggregation; (2) SPREADING for identical payloads — the
  * pathological hot key is many byte-identical rows, which any
  * content hash sends to one salt (ids differ even when payloads
  * don't); and (3) PRUNING-safe — hashing `struct(*)` would force
  * every column through the scan.
  */
object Salting {

  private[graft] def salt(saltCols: Seq[String], buckets: Int) = {
    require(saltCols.nonEmpty, "saltCols: supply identity columns to hash")
    pmod(xxhash64(saltCols.map(col): _*), lit(buckets.toLong))
  }

  /** count(*) per key, skew-spread over `buckets` reducers. */
  def saltedCount(df: DataFrame, keyCols: Seq[String], saltCols: Seq[String],
                  buckets: Int, outCol: String = "n"): DataFrame = {
    require(buckets > 0)
    df.withColumn("__salt", salt(saltCols, buckets))
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum("__partial").as(outCol))
  }

  /** sum(valueCol) per key, skew-spread over `buckets` reducers. */
  def saltedSum(df: DataFrame, keyCols: Seq[String], saltCols: Seq[String],
                valueCol: String, buckets: Int,
                outCol: String = "sum"): DataFrame = {
    require(buckets > 0)
    df.withColumn("__salt", salt(saltCols, buckets))
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
                      keyCols: Seq[String], saltCols: Seq[String],
                      buckets: Int)
      : (DataFrame, DataFrame, Seq[String]) = {
    require(buckets > 0)
    val bigSalted = big.withColumn("__salt", salt(saltCols, buckets))
    val smallRep = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(buckets - 1L))))
    (bigSalted, smallRep, keyCols :+ "__salt")
  }
}
