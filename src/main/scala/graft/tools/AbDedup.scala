package graft

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-22 A/B driver for the d2/d11 exact-verify shapes (the r21
  * verdict's task #1): interleaved min-over-N runs of the round-21
  * join-count verify vs the round-20 collect_set verify, at sf0.1 and
  * at an N×-replicated corpus (the Dedup.embeddingNearDups sizing
  * protocol), with Bench's cache hygiene between runs. Decision rule:
  * keep the sf0.1 winner (the scale the driver measures); if the
  * shapes flip at the larger scale, gate by corpus size.
  * Usage: sbt "runMain graft.AbDedup [reps] [repFactor]"
  */
object AbDedup {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val repFactor = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    // Replicated corpus: ids disjoint, a replica marker prefixed so the
    // first shingles differ; cross-replica near-dup pairs remain (the
    // dup-heavy density a larger crawl actually has).
    // parquet round-trip, not localCheckpoint: the between-run cache
    // hygiene (dropCachedBlocks) would unpersist a checkpointed frame
    // whose truncated lineage cannot recompute — and parquet input is
    // what the real queries read anyway.
    val bigPath = java.nio.file.Files
      .createTempDirectory("graft_ab_big_").toString + "/documents.parquet"
    (0 until repFactor)
      .map(i => docs.select((col("doc_id") * repFactor + i).as("doc_id"),
        concat(lit(s"x$i "), col("text")).as("text")))
      .reduce(_ unionByName _)
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(bigPath)
    val big = spark.read.parquet(bigPath)

    def hygiene(): Unit = {
      SessionHygiene.dropCachedBlocks(spark)
      System.gc()
    }
    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      hygiene()
      s
    }
    def ab(label: String, a: => DataFrame, b: => DataFrame): Unit = {
      // one untimed warmup pair (codegen/JIT), then interleaved reps
      time(a); time(b)
      val as = collection.mutable.ArrayBuffer.empty[Double]
      val bs = collection.mutable.ArrayBuffer.empty[Double]
      (1 to reps).foreach { _ => as += time(a); bs += time(b) }
      def fmt(xs: Seq[Double]) =
        xs.map(x => f"$x%.2f").mkString("[", ",", "]") + f" min=${xs.min}%.2f"
      println(s"[ab] $label A(join-count) ${fmt(as.toSeq)}  B(collect_set) ${fmt(bs.toSeq)}")
    }

    // d11's A/B (round-21 candidate-bounded verify vs the r20
    // collect_set verify) measured collect_set winning at BOTH scales
    // (sf0.1 0.79 vs 1.04 s; 4× 2.42 vs 3.15 s), so
    // minhashNearDupsAgainst was reverted unconditionally and only the
    // d2 shape gate remains parameterized for re-measurement.
    ab("d2 sf0.1",
      Dedup.minhashNearDupsImpl(docs, "doc_id", "text", 32, 4, 3, 0.5,
        joinCountVerify = Some(true)),
      Dedup.minhashNearDupsImpl(docs, "doc_id", "text", 32, 4, 3, 0.5,
        joinCountVerify = Some(false)))
    ab(s"d2 ${repFactor}x",
      Dedup.minhashNearDupsImpl(big, "doc_id", "text", 32, 4, 3, 0.5,
        joinCountVerify = Some(true)),
      Dedup.minhashNearDupsImpl(big, "doc_id", "text", 32, 4, 3, 0.5,
        joinCountVerify = Some(false)))
    spark.stop()
  }
}
