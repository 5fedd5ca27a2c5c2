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

  /** Deterministic shard assignment: adds `shard` in [0, nShards). */
  def withShard(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards $nShards must be >= 1")
    df.withColumn("shard", Curation.hashBucket(col(idCol), nShards))
  }

  /** Per-shard manifest of an assignment: (shard, n_docs, n_tokens).
    * Pure declarative form — oracle-expressible, no files involved. */
  def manifest(df: DataFrame, idCol: String, textCol: String,
               nShards: Int): DataFrame =
    withShard(df, idCol, nShards)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCountWs(col(textCol)).cast("long"))
          .as("n_tokens"))

  /** Physical export: one parquet file per shard directory under
    * `outDir/shard=<s>/`, rows in the deterministic md5 read order,
    * plus `_graft_manifest` (parquet) recording per-shard counts
    * computed from the written files. Returns the manifest. */
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
    val written = spark.read.parquet(outDir)
    val mf = written.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCountWs(col(textCol)).cast("long"))
          .as("n_tokens"))
    mf.coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/_graft_manifest")
    spark.read.parquet(s"$outDir/_graft_manifest")
  }
}
