package graft.operators

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.DataFrame
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
