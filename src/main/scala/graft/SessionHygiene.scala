package graft

import org.apache.spark.sql.SparkSession

/** Cache hygiene between independent queries in one session — the
  * contract the dedup operators' persist() relies on (see
  * Dedup.minhashNearDups): `catalog.clearCache` drops Dataset.persist
  * entries (pinned by the CacheManager — the ContextCleaner never
  * frees them while the session lives); the RDD loop drops
  * localCheckpoint blocks, which live outside the CacheManager.
  * Shared by Bench and Verify so the two harnesses cannot drift. */
private[graft] object SessionHygiene {
  def dropCachedBlocks(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
  }
}
