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

  /** JSONL export — the same shard/order contract as [[writeShards]],
    * emitted as the newline-delimited-JSON shards most LLM training
    * stacks ingest directly (one compressed `.json.gz` part per shard
    * directory). The deterministic md5 read order and
    * one-file-per-shard layout carry over unchanged, and the manifest
    * is computed from a READ-BACK of the written files, so the
    * recorded counts describe what landed on disk — a truncated write
    * cannot report healthy counts. The read-back PINS the writer's
    * schema (`spark.read.schema(...)`) instead of paying JSON schema
    * inference: pinning skips the inference pass entirely (an extra
    * decompress+parse of every gz shard just to guess types) and
    * keeps the writer's integer widths, which inference would widen
    * to long. (String columns are safe either way — the JSON writer
    * quotes them, so inference keeps even an all-numeric text column
    * as string; the pin's value is cost and width, not quoting.)
    * The same
    * `_graft_meta` modulus sidecar as [[writeShards]] is recorded, so
    * the two sinks' exports are interchangeable to tooling that
    * checks it. Binary columns are rejected loudly rather than
    * silently base64-inflated 4/3×. */
  def writeShardsJsonl(df: DataFrame, idCol: String, textCol: String,
                       outDir: String, nShards: Int,
                       compression: String = "gzip"): DataFrame = {
    require(nShards >= 1, s"nShards $nShards must be >= 1")
    require(!df.schema.fields.exists(_.dataType ==
        org.apache.spark.sql.types.BinaryType),
      "writeShardsJsonl: binary columns would be silently base64-inflated; " +
        "export binary payloads via writeShards (parquet) instead")
    val spark = df.sparkSession
    val assigned = withShard(df, idCol, nShards)
    assigned
      .withColumn("__ord", md5(col(idCol).cast("string")))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__ord"))
      .drop("__ord")
      .write.mode("overwrite").partitionBy("shard")
      .option("compression", compression).json(outDir)
    spark.range(1).select(lit(nShards).cast("int").as("n_shards"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/_graft_meta")
    // pinned-schema read-back: data columns keep the writer's types
    // (no inference); the json source still types the shard PARTITION
    // value as long regardless of the pinned schema, so it is cast
    // back to int to match writeShards' manifest exactly
    val written = spark.read.schema(assigned.schema).json(outDir)
    countsByShard(written, textCol)
      .withColumn("shard", col("shard").cast("int"))
      .coalesce(1).write.mode("overwrite")
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
    * by TWO renames through a `_graft_trash_upsert` parking dir —
    * live → trash, staged → live — so the merge never holds the
    * affected set on the heap (`localCheckpoint` would) and at every
    * instant each shard's rows exist in full somewhere on disk (the
    * round-10 delete-then-rename had a window where a crash lost the
    * shard outright: a retry would then re-merge against an export
    * silently missing those docs). The flip loop is still not atomic
    * ACROSS shards, so a `_graft_upsert_pending` journal (the
    * affected-shard list) is written after staging and removed after
    * the manifest lands; the next upsert call first COMPLETES a
    * crashed predecessor's remaining flips from the surviving staging
    * dir and recounts the journal's shards — idempotent from every
    * crash window. What this deliberately does NOT give is reader
    * isolation DURING a flip: a concurrent reader can see a mix of
    * old and new shards (each internally complete). Snapshot
    * isolation is [[IndexStore.writeVersioned]]'s trade — a
    * full-corpus rewrite per version, wrong for a daily delta. */
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
    // a crashed predecessor's flips must complete BEFORE this call
    // reads the export, or the merge would run against a mixed (or,
    // pre-repair, shard-missing) view and bake it in
    recoverPendingUpsert(spark, outDir, textCol)
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
    // stage while sources still exist, then journal + flip per shard
    val tmp = s"$outDir/_graft_tmp_upsert"
    merged.write.mode("overwrite").partitionBy("shard").parquet(tmp)
    locally {
      import spark.implicits._
      affected.map(_.toString.toInt).toSeq.toDF("shard")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/_graft_upsert_pending")
    }
    flipStagedShards(spark, outDir, affected.map(_.toString.toInt))
    mergeManifestFor(spark, outDir, affected.map(_.toString.toInt), textCol)
    spark.read.parquet(s"$outDir/_graft_manifest")
  }

  private def fsOf(spark: org.apache.spark.sql.SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Flip each staged `_graft_tmp_upsert/shard=<s>` into place via two
    * renames through `_graft_trash_upsert` (live → trash, staged →
    * live): no instant at which a shard's rows aren't on disk in full.
    * Idempotent per shard — an already-flipped shard (absent from
    * staging) is skipped, and a shard caught between its two renames
    * (absent from live AND staging) is restored from trash — so a
    * recovery rerun after a crash in ANY window converges. Trash and
    * staging dirs are deleted only after every shard is live. */
  private def flipStagedShards(spark: org.apache.spark.sql.SparkSession,
                               outDir: String, shards: Seq[Int]): Unit = {
    val fs = fsOf(spark, outDir)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val tmp = s"$outDir/_graft_tmp_upsert"
    val trash = s"$outDir/_graft_trash_upsert"
    fs.mkdirs(p(trash))
    shards.foreach { s =>
      val staged = p(s"$tmp/shard=$s")
      val live = p(s"$outDir/shard=$s")
      val parked = p(s"$trash/shard=$s")
      if (fs.exists(staged)) {
        if (fs.exists(live)) {
          if (fs.exists(parked)) fs.delete(parked, true)
          require(fs.rename(live, parked),
            s"upsertShards: park $live -> $parked failed")
        }
        require(fs.rename(staged, live),
          s"upsertShards: flip $staged -> $live failed")
      } else if (!fs.exists(live)) {
        // crashed between park and flip with staging since lost —
        // possible only under external tampering; restore loudly
        require(fs.exists(parked),
          s"upsertShards: shard=$s missing from live, staging AND trash")
        require(fs.rename(parked, live),
          s"upsertShards: restore $parked -> $live failed")
      }
    }
    fs.delete(p(trash), true)
    fs.delete(p(tmp), true)
  }

  /** Delta-bounded manifest refresh: recount ONLY `shards` (partition-
    * pruned read — static PartitionFilters, the d12 scheme), keep the
    * other rows from the previous manifest, flip the result in via the
    * same two-rename pattern, then clear the `_graft_upsert_pending`
    * journal — the upsert's commit point. Re-reading the whole export
    * to recount it would put the corpus-proportional scan right back
    * into the incremental path. */
  private def mergeManifestFor(spark: org.apache.spark.sql.SparkSession,
                               outDir: String, shards: Seq[Int],
                               textCol: String): Unit = {
    val fs = fsOf(spark, outDir)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val mfLive = s"$outDir/_graft_manifest"
    val mfTrash = s"$outDir/_graft_manifest_trash"
    // a crash between the manifest's two renames leaves only the trash
    // copy; read whichever exists so recovery still sees the old rows
    val mfSrc = if (fs.exists(p(mfLive))) mfLive else mfTrash
    require(fs.exists(p(mfSrc)), s"upsertShards: manifest missing at $mfLive")
    val keptMf = spark.read.parquet(mfSrc)
      .filter(!col("shard").isin(shards: _*))
    val affMf = countsByShard(
      spark.read.parquet(outDir).filter(col("shard").isin(shards: _*)),
      textCol)
    val mf = keptMf.unionByName(affMf.select(keptMf.columns.map(col): _*))
    val mfTmp = s"$outDir/_graft_manifest_tmp"
    mf.coalesce(1).write.mode("overwrite").parquet(mfTmp)
    if (fs.exists(p(mfTrash))) fs.delete(p(mfTrash), true)
    if (fs.exists(p(mfLive)))
      require(fs.rename(p(mfLive), p(mfTrash)),
        s"upsertShards: park manifest failed")
    require(fs.rename(p(mfTmp), p(mfLive)),
      s"upsertShards: flip manifest failed")
    fs.delete(p(mfTrash), true)
    fs.delete(p(s"$outDir/_graft_upsert_pending"), true)
  }

  /** Complete a crashed upsert from its surviving journal: if
    * `_graft_upsert_pending` exists, finish the remaining flips from
    * the staging dir and recount the journal's shards; without a
    * journal, a leftover staging/trash dir belongs to an upsert that
    * crashed BEFORE its commit protocol started (the caller never saw
    * success and will resubmit the delta), so it is discarded.
    * Idempotent — safe to call from every upsert and from operational
    * tooling. */
  def recoverPendingUpsert(spark: org.apache.spark.sql.SparkSession,
                           outDir: String, textCol: String): Unit = {
    val fs = fsOf(spark, outDir)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val pending = s"$outDir/_graft_upsert_pending"
    if (fs.exists(p(pending))) {
      val shards = spark.read.parquet(pending)
        .collect().map(_.getInt(0)).toSeq
      flipStagedShards(spark, outDir, shards)
      mergeManifestFor(spark, outDir, shards, textCol)
    } else {
      fs.delete(p(s"$outDir/_graft_tmp_upsert"), true)
      fs.delete(p(s"$outDir/_graft_trash_upsert"), true)
    }
  }
}
