package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S2/S4: vector index persistence (the reference's Chroma store —
  * upsert-by-id rows + an ANN structure — re-expressed as columnar
  * Parquet, SURVEY.md §1.3).
  *
  * Write is `overwrite` — atomic-enough versus the reference's
  * rm-rf-then-rebuild crash window (S3, build_vectorstore.py:22-24).
  * When a `cluster_id` column is present (from [[graft.operators.Ann]]
  * ivfAssign), the table is PARTITIONED BY cluster: an IVF probe then
  * prunes to nprobe directories at scan time — the columnar analogue
  * of an inverted file, and the layout that keeps a 100 TB index
  * queryable without a full scan.
  */
object IndexStore {

  def write(index: DataFrame, path: String): Unit = {
    val w = index.write.mode("overwrite")
    if (index.columns.contains("cluster_id")) w.partitionBy("cluster_id").parquet(path)
    else w.parquet(path)
  }

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Upsert-by-id merge (the Chroma `ids=` semantics,
    * build_vectorstore.py:239): new rows win per id. */
  def upsert(spark: SparkSession, path: String,
             batch: DataFrame, idCol: String): Unit = {
    val deduped = batch.dropDuplicates(idCol)
    val merged =
      try {
        val existing = spark.read.parquet(path)
        existing.join(deduped, Seq(idCol), "left_anti").unionByName(deduped)
      } catch { case _: Throwable => deduped }
    merged.localCheckpoint(true).write.mode("overwrite").parquet(path)
  }
}
