package graft.sources

import graft.operators.Curation
import graft.functions.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-shard export — the corpus OUTPUT sink of the curation
  * pipeline (curate → cap → pack → '''export'''), the step that turns
  * a curated DataFrame into the fixed set of files a training job
  * actually consumes. [[IndexStore]] is the vector-side sink; this is
  * the text-side one.
  *
  * Two properties a 100 TB export must have, both delivered by
  * deterministic hashing rather than randomness:
  *
  *   - '''Stable shard assignment''': shard = md5-bucket of the doc
  *     id ([[Curation.hashBucket]] — the t10 split idiom). A document
  *     lands in the same shard on every run and every engine, so an
  *     incremental re-export rewrites only shards whose membership
  *     changed, and an auditor can locate any doc's shard from its id
  *     alone. `repartition(nShards, shard)` then `partitionBy(shard)`
  *     writes each shard's rows from exactly one task — one file per
  *     shard directory, never a small-file explosion (a hash
  *     collision between shard VALUES only merges two writer tasks,
  *     it never splits a shard across files).
  *   - '''Reproducible global shuffle''': training wants documents in
  *     random order, but `rand(seed)` is partition-layout-dependent —
  *     re-ingest the corpus with different parallelism and the
  *     "same-seed" order changes. Sorting within each shard by the
  *     md5 of the id gives a pseudo-random read order that is a pure
  *     function of the data: byte-identical shards on every rerun.
  *     The sort is per-shard (`sortWithinPartitions`), never global.
  *
  * The manifest (per-shard doc/token counts) is the declarative twin
  * the harness oracle-checks; `writeShards` returns it from the
  * written data so the recorded counts describe the files, not the
  * plan.
  */
object ShardExport {

  /** The manifest aggregate — ONE definition shared by the
    * declarative twin, the full-export recount, and the incremental
    * merge, so the three can never drift on what a manifest row
    * means. */
  private def countsByShard(df: DataFrame, textCol: String): DataFrame =
    df.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCountWs(col(textCol)).cast("long"))
          .as("n_tokens"))

  /** Deterministic shard assignment: adds `shard` in [0, nShards). */
  def withShard(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards $nShards must be >= 1")
    df.withColumn("shard", Curation.hashBucket(col(idCol), nShards))
  }

  /** Per-shard manifest of an assignment: (shard, n_docs, n_tokens).
    * Pure declarative form — oracle-expressible, no files involved. */
  def manifest(df: DataFrame, idCol: String, textCol: String,
               nShards: Int): DataFrame =
    countsByShard(withShard(df, idCol, nShards), textCol)

  /** Physical export: one parquet file per shard directory under
    * `outDir/shard=<s>/`, rows in the deterministic md5 read order,
    * plus `_graft_manifest` (parquet) recording per-shard counts
    * computed from the written files and `_graft_meta` recording the
    * modulus (`n_shards`) the assignment used — [[upsertShards]]
    * requires its caller's nShards to match it, because a delta
    * re-bucketed under a different modulus would land updated docs in
    * NEW shards while their stale originals survive untouched in the
    * old ones, silently. Returns the manifest. (Leading-underscore
    * sidecar dirs are invisible to parquet partition discovery — the
    * `_graft_manifest` precedent.) */
  def writeShards(df: DataFrame, idCol: String, textCol: String,
                  outDir: String, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards $nShards must be >= 1")
    val spark = df.sparkSession
    withShard(df, idCol, nShards)
      .withColumn("__ord", md5(col(idCol).cast("string")))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__ord"))
      .drop("__ord")
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    spark.range(1).select(lit(nShards).cast("int").as("n_shards"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_graft_meta")
    val written = spark.read.parquet(outDir)
    val mf = countsByShard(written, textCol)
    mf.coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/_graft_manifest")
    spark.read.parquet(s"$outDir/_graft_manifest")
  }

  /** Incremental re-export: merge `delta` (new or changed docs,
    * overwrite-by-id) into an existing export, rewriting ONLY the
    * shard directories the delta's ids hash into — the point of the
    * stable assignment. At 100 TB a daily delta touches a handful of
    * docs per shard; rewriting the whole corpus to admit them is the
    * scale-killer this avoids (untouched shard directories keep their
    * physical files, ShardExportSpec asserts identity by inode-level
    * listing). The affected-shard list is a driver collect bounded by
    * nShards. Rewritten shards keep the deterministic md5 order, so a
    * full rewrite and an incremental one produce row-identical
    * shards. Returns the refreshed manifest.
    *
    * Read-modify-write without pinning rows in memory: the merged
    * shards are written whole to a `_graft_tmp_upsert` staging dir
    * (invisible to partition discovery) while their source files
    * still exist, then each affected `shard=<s>` directory is flipped
    * by delete + rename — the [[IndexStore]] write-then-flip pattern,
    * so the merge never holds the affected set on the heap
    * (`localCheckpoint` would) and a crash mid-write leaves the live
    * export untouched. The manifest merge gets the same treatment. */
  def upsertShards(outDir: String, delta: DataFrame, idCol: String,
                   textCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards $nShards must be >= 1")
    val spark = delta.sparkSession
    // the modulus is a property of the EXPORT, recorded at write time:
    // a delta bucketed under any other nShards would strand stale
    // copies of updated docs in their original shards with no error
    val storedN = spark.read.parquet(s"$outDir/_graft_meta")
      .select("n_shards").head().getInt(0)
    require(storedN == nShards,
      s"upsertShards: nShards $nShards does not match the export's " +
        s"recorded n_shards $storedN — re-bucketing a delta under a " +
        "different modulus would leave stale duplicates of updated docs " +
        "in their original shards")
    val deduped = withShard(delta.dropDuplicates(idCol), idCol, nShards)
    val affected = deduped.select("shard").distinct()
      .collect().map(_.get(0)) // bounded by nShards
    val existing = spark.read.parquet(outDir)
      .filter(col("shard").isin(affected: _*))
      .join(deduped.select(col(idCol)), Seq(idCol), "left_anti")
    val merged = existing.unionByName(deduped.select(existing.columns.map(col): _*))
      .withColumn("__ord", md5(col(idCol).cast("string")))
      .repartition(affected.length.max(1), col("shard"))
      .sortWithinPartitions(col("shard"), col("__ord"))
      .drop("__ord")
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def flip(src: String, dst: String): Unit = {
      val (s, d) = (new org.apache.hadoop.fs.Path(src),
        new org.apache.hadoop.fs.Path(dst))
      if (fs.exists(d)) fs.delete(d, true)
      require(fs.rename(s, d), s"upsertShards: rename $src -> $dst failed")
    }
    // stage while sources still exist, then flip per affected shard
    val tmp = s"$outDir/_graft_tmp_upsert"
    merged.write.mode("overwrite").partitionBy("shard").parquet(tmp)
    affected.foreach(s => flip(s"$tmp/shard=$s", s"$outDir/shard=$s"))
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    // manifest merge stays delta-bounded too: recount ONLY the
    // rewritten shards (partition-pruned read — static
    // PartitionFilters, the d12 scheme), keep the other rows from the
    // previous manifest. Re-reading the whole export to recount it
    // would put the corpus-proportional scan right back into the
    // incremental path.
    val keptMf = spark.read.parquet(s"$outDir/_graft_manifest")
      .filter(!col("shard").isin(affected: _*))
    val affMf = countsByShard(
      spark.read.parquet(outDir).filter(col("shard").isin(affected: _*)),
      textCol)
    val mf = keptMf.unionByName(affMf.select(keptMf.columns.map(col): _*))
    val mfTmp = s"$outDir/_graft_manifest_tmp"
    mf.coalesce(1).write.mode("overwrite").parquet(mfTmp)
    flip(mfTmp, s"$outDir/_graft_manifest")
    spark.read.parquet(s"$outDir/_graft_manifest")
  }
}
