package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MLlib batch vector indexing (the north star's named approach:
  * "MLlib for batch vector indexing" — BASELINE.json). Random-
  * hyperplane bucketing in Euclidean space matches the reference's L2
  * metric (/root/reference/main.py:158-164); results are approximate
  * and seed-deterministic, so they get spec-level verification against
  * the exact operators rather than a DuckDB oracle.
  *
  * Scale shape: `fit` samples nothing (random projections), transform
  * is a narrow map; `approxSimilarityJoin` explodes each side by
  * numHashTables and shuffle-joins on (table, bucket) — hash-sized
  * keys, like the MinHash bands — then filters by exact distance.
  */
object LshAnn {

  private def withVec(df: DataFrame, embCol: String): DataFrame =
    df.withColumn("__vec", array_to_vector(col(embCol).cast("array<double>")))

  private def fitModel(data: DataFrame, bucketLength: Double,
                       numTables: Int, seed: Long) = {
    new BucketedRandomProjectionLSH()
      .setInputCol("__vec")
      .setOutputCol("__hashes")
      .setBucketLength(bucketLength)
      .setNumHashTables(numTables)
      .setSeed(seed)
      .fit(data)
  }

  /** The fitted model's random hyperplanes as a relation:
    * (table_idx, plane: array<double>, bucket_length). This is what
    * makes the seeded-LSH family ORACLE-CHECKABLE: the projections are
    * drawn once at fit time from the seed, so exporting them as a
    * sidecar table lets an independent engine replay the entire
    * bucketing — `floor(dot(v, plane) / bucket_length)` per table —
    * and verify the ANN results hash-for-hash instead of trusting a
    * recall measurement. `randUnitVectors` is `private[ml]` in Scala
    * but a public JVM accessor, hence the reflective read; the
    * replay-equals-transform contract is pinned by LshAnnSpec against
    * `model.transform` on every corpus vector. */
  def hyperplanes(corpus: DataFrame, embCol: String, bucketLength: Double,
                  numTables: Int, seed: Long = 42L): DataFrame = {
    val model = fitModel(withVec(corpus, embCol), bucketLength, numTables, seed)
    val planes = model.getClass.getMethod("randUnitVectors").invoke(model)
      .asInstanceOf[Array[org.apache.spark.ml.linalg.Vector]]
    val spark = corpus.sparkSession
    import spark.implicits._
    planes.zipWithIndex
      .map { case (v, i) => (i, v.toArray, bucketLength) }.toSeq
      .toDF("table_idx", "plane", "bucket_length")
  }

  /** Write [[hyperplanes]] as a single-file parquet sidecar at `path`
    * (overwrite): the index-time artifact the DuckDB oracle reads to
    * replay the bucketing. numTables×dim doubles — driver-size by
    * construction, so coalesce(1) is bounded. */
  def writeHyperplaneSidecar(corpus: DataFrame, embCol: String, path: String,
                             bucketLength: Double, numTables: Int,
                             seed: Long = 42L): Unit =
    hyperplanes(corpus, embCol, bucketLength, numTables, seed)
      .coalesce(1).write.mode("overwrite").parquet(path)

  /** Single-query ANN: multi-probe kNN over the bucketed index. */
  def approxNearest(corpus: DataFrame, embCol: String, idCol: String,
                    queryVec: Seq[Double], k: Int,
                    bucketLength: Double = 2.0, numTables: Int = 4,
                    seed: Long = 42L): DataFrame = {
    val data = withVec(corpus, embCol)
    val model = fitModel(data, bucketLength, numTables, seed)
    model.approxNearestNeighbors(data, Vectors.dense(queryVec.toArray), k)
      .select(col(idCol), col("distCol").as("dist"))
  }

  /** The model's bucketing as a relation: (idCol, table_idx, bucket)
    * for every corpus vector — one row per (vector, hash table), the
    * exploded index a bucket join runs on. Public so the sidecar
    * replay contract is spec-checkable: recomputing
    * `floor(dot(vec, plane) / bucket_length)` from [[hyperplanes]]
    * must reproduce this table exactly (LshAnnSpec pins it). */
  def bucketTable(corpus: DataFrame, embCol: String, idCol: String,
                  bucketLength: Double, numTables: Int,
                  seed: Long = 42L): DataFrame = {
    val data = withVec(corpus, embCol)
    val model = fitModel(data, bucketLength, numTables, seed)
    model.transform(data)
      .select(col(idCol), posexplode(col("__hashes")).as(Seq("__t", "__h")))
      .select(col(idCol), col("__t").as("table_idx"),
        element_at(vector_to_array(col("__h")), 1).cast("long").as("bucket"))
  }

  /** Batch LSH kNN: top-k per query served from the bucketed index —
    * the batch form of [[approxNearest]], built on the same fitted
    * model. Candidates are (query, doc) pairs sharing ≥1
    * (table, bucket) key; survivors are reranked by EXACT L2 with id
    * tie-breaks, so output order is deterministic given the seed.
    *
    * Scale shape (the MinHash-band pattern): both sides explode to
    * `numTables` narrow (table, bucket, id) rows, the candidate join
    * shuffles those hash-sized keys — never vectors — and the vectors
    * join back ONCE for the exact rerank of the sparse candidate set.
    * The final top-k is a rank window partitioned by query, bounded by
    * each query's candidates. A query whose buckets are empty returns
    * no rows (probe more tables / wider buckets), which is the honest
    * ANN contract — [[lshRecall]]-style measurement decides whether a
    * config earns trust, exactly like the IVF path's recall query. */
  def approxNearestBatch(corpus: DataFrame, embCol: String, idCol: String,
                         queries: DataFrame, qidCol: String, qvecCol: String,
                         k: Int, bucketLength: Double = 2.0,
                         numTables: Int = 4, seed: Long = 42L): DataFrame = {
    val data = withVec(corpus, embCol)
    val model = fitModel(data, bucketLength, numTables, seed)
    // Reserved __q* rename up front (ivfSearchBatch's guard): queries
    // drawn from the corpus table itself (qidCol == idCol, qvecCol ==
    // embCol — the natural recall-eval call) would otherwise make the
    // bucket and rerank joins ambiguous.
    val q = queries.select(col(qidCol).as("__qid"), col(qvecCol).as("__qvec"))
    def bucketKeys(df: DataFrame, keep: String) = model.transform(df)
      .select(col(keep), posexplode(col("__hashes")).as(Seq("__t", "__h")))
      .select(col(keep), col("__t"),
        element_at(vector_to_array(col("__h")), 1).cast("long").as("__b"))
    val cand = bucketKeys(data, idCol)
      .join(bucketKeys(q.withColumn("__vec",
          array_to_vector(col("__qvec").cast("array<double>"))), "__qid"),
        Seq("__t", "__b"))
      .select(col("__qid"), col(idCol)).distinct()
    val scored = cand
      .join(corpus.select(col(idCol), col(embCol)), Seq(idCol))
      .join(q, Seq("__qid"))
      .withColumn("dist", VectorFunctions.l2(col(embCol), col("__qvec")))
    // output query-id name: when the caller's qidCol collides with the
    // corpus idCol (queries drawn from the corpus table), emitting both
    // under one name would make every by-name read downstream ambiguous
    val qidOut = if (qidCol == idCol) s"${qidCol}_q" else qidCol
    scored
      .withColumn("knn_rank", row_number().over(
        Window.partitionBy(col("__qid")).orderBy(col("dist"), col(idCol))))
      .filter(col("knn_rank") <= k)
      .select(col("__qid").as(qidOut), col("knn_rank"), col(idCol), col("dist"))
  }

  /** Batch similarity self-join: all pairs within `threshold` L2. */
  def approxSelfJoin(corpus: DataFrame, embCol: String, idCol: String,
                     threshold: Double, bucketLength: Double = 2.0,
                     numTables: Int = 4, seed: Long = 42L): DataFrame = {
    val data = withVec(corpus, embCol)
    val model = fitModel(data, bucketLength, numTables, seed)
    model.approxSimilarityJoin(data, data, threshold, "dist")
      .select(
        col(s"datasetA.$idCol").as("id_a"),
        col(s"datasetB.$idCol").as("id_b"),
        round(col("dist"), 6).as("dist"))
      .filter(col("id_a") < col("id_b"))
  }
}
