package graft

import graft.operators.{Bm25, Dedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-22 interleaved A/B for the single-file-scan spread exchanges:
  * simhash word explode (d3/d10/d21 family), Bm25.buildPostings
  * (i1/i3/b2), the t35 Misra-Gries recount, and the d21 quality
  * featurization. Usage: sbt "runMain graft.AbSpread [reps]" */
object AbSpread {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val par = spark.sparkContext.defaultParallelism
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val evRaw = spark.read.parquet(s"$sfDir/events.parquet")
    val evTs = evRaw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        evRaw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => evRaw
      case _ => evRaw.withColumn("ts",
        col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
    val ev0 = evTs.select(col("ts"), col("user_id").cast("string").as("uid"))
    def clean(): Unit = { SessionHygiene.dropCachedBlocks(spark); System.gc() }
    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9; clean(); s
    }
    def t35of(ev: DataFrame): DataFrame = {
      val counts = graft.streaming.HeavyHitterMonitor.windowedCandidates(
        ev, "ts", "uid", capacity = 64)
      graft.streaming.HeavyHitterMonitor.verifiedHitters(
        ev, counts, "ts", "uid", k = 4, capacity = 64)
    }
    def d21of(spread: Boolean): DataFrame = {
      val comp = Dedup.components(
        Dedup.simhashNearDupsWide(docs, "doc_id", "text", maxHamming = 3))
      val base = if (spread) docs.repartition(par) else docs
      val scored = base.select(col("doc_id"),
        graft.functions.TextAnalysis.qualityScore(col("text")).as("quality"))
      Dedup.applyPurgeManifestBy(scored, "doc_id", comp, "quality")
        .orderBy("doc_id")
    }
    // (label, spread-on thunk, spread-off thunk)
    val cases: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("d3_simhash",
        () => { Dedup.spreadSimhashWords = true
          Dedup.simhash16(docs, "doc_id", "text") },
        () => { Dedup.spreadSimhashWords = false
          Dedup.simhash16(docs, "doc_id", "text") }),
      ("d10ish_wide_pairs",
        () => { Dedup.spreadSimhashWords = true
          Dedup.simhashNearDupsWide(docs, "doc_id", "text", 3) },
        () => { Dedup.spreadSimhashWords = false
          Dedup.simhashNearDupsWide(docs, "doc_id", "text", 3) }),
      ("i1_build_postings",
        () => Bm25.buildPostings(docs, "doc_id", "text", spread = true),
        () => Bm25.buildPostings(docs, "doc_id", "text", spread = false)),
      ("t35_hitters",
        () => t35of(ev0.repartition(par)),
        () => t35of(ev0)),
      ("d21_quality_keeper",
        () => d21of(true),
        () => d21of(false)))
    cases.foreach { case (_, on, off) => time(on()); time(off()) } // warmup
    cases.foreach { case (n, on, off) =>
      val a = collection.mutable.ArrayBuffer.empty[Double]
      val b = collection.mutable.ArrayBuffer.empty[Double]
      (1 to reps).foreach { _ => a += time(on()); b += time(off()) }
      def fmt(x: Seq[Double]) =
        x.map(v => f"$v%.2f").mkString(",") + f" min=${x.min}%.2f"
      println(s"[ab] $n spread[${fmt(a.toSeq)}] noSpread[${fmt(b.toSeq)}]")
    }
    Dedup.spreadSimhashWords = true
    spark.stop()
  }
}
