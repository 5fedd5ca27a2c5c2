package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed table layout — the storage-side half of the co-located
  * join story (reference analog: the persisted vector-store layout
  * queries serve from without re-ingesting,
  * `build_vectorstore.py:242`; here applied to the relational
  * tables).
  *
  * A join between two tables bucketed by the join key into the SAME
  * bucket count is satisfied by each side's scan partitioning: Catalyst
  * plans SortMergeJoin with NO Exchange on either side (and with
  * `sortBy` + one file per bucket, no Sort either). At 100 TB this is
  * the difference between shuffling both fact tables on every join and
  * shuffling them ONCE at layout time: every subsequent
  * join/aggregation keyed on the bucket column rides the layout for
  * free. The same property holds per-executor on a 1000-node cluster —
  * bucket→partition mapping is stable, so co-location never depends on
  * AQE or on both sides fitting in memory (contrast broadcast).
  *
  * `writeBucketed` pre-repartitions by the bucket expression so each
  * task holds exactly the rows of its buckets — without it every task
  * writes a file per bucket it happens to hold (task×bucket small
  * files, and per-bucket sort order is lost for the sort-elimination
  * path). Bucketed tables need a catalog entry (the bucket spec lives
  * in table metadata, not the files), so tables land in a caller-named
  * database whose LOCATION the caller controls; the in-memory catalog
  * of a fresh session is enough — no Hive metastore required.
  */
object BucketedLayout {

  /** Create `db` at `location` if absent (idempotent). The identifier
    * is backtick-quoted and the location's quotes escaped — both are
    * interpolated into SQL, so an apostrophe-bearing temp path (or a
    * keyword-named db) must not break the statement. */
  def ensureDatabase(spark: SparkSession, db: String, location: String): Unit = {
    require(!db.contains("`"), s"db name must not contain backticks: $db")
    val loc = location.replace("'", "''")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db` LOCATION '$loc'")
  }

  /** Write `df` as `db.table` bucketed AND per-bucket-sorted by
    * `key` — the layout-time shuffle every later key-joined query
    * skips. Overwrites an existing table of the same name. */
  def writeBucketed(df: DataFrame, fqTable: String, key: String,
                    nBuckets: Int): Unit =
    df.repartition(nBuckets, col(key))
      .write.bucketBy(nBuckets, key).sortBy(key)
      .mode("overwrite").saveAsTable(fqTable)
}
