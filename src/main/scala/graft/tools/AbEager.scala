package graft

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-22 interleaved A/B: eager vs lazy materialization of the
  * persisted shingle frame ([[Dedup.eagerShingleMaterialize]]) on the
  * queries that consume it (d2/d4/d14 shapes). Usage:
  * sbt "runMain graft.AbEager [reps]" */
object AbEager {
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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    def clean(): Unit = { SessionHygiene.dropCachedBlocks(spark); System.gc() }
    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9; clean(); s
    }
    def d2() = Dedup.minhashNearDups(docs, "doc_id", "text", 32, 4, 3, 0.5)
    def d4() = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, 0.4)
    def d14() = Dedup.containmentPairs(docs, "doc_id", "text", 3, 20, 2, 0.8)
    val mode = sys.env.getOrElse("GRAFT_AB_MODE", "shingle")
    def setEager(b: Boolean): Unit = mode match {
      case "gram" => operators.Curation.eagerGramMaterialize = b
      case _      => Dedup.eagerShingleMaterialize = b
    }
    def d9() = operators.Curation.duplicateSpans(docs, "doc_id", "text",
      k = 4, minTokens = 8, maxGramDf = 50)
    def d16() = operators.Curation.removeDuplicateSpans(docs, "doc_id",
      "text", k = 4, minTokens = 8, maxGramDf = 50)
    def t11() = operators.Curation.contamination(
      docs.filter(col("doc_id") % 10 =!= 0), docs.filter(col("doc_id") % 10 === 0),
      "doc_id", "text", k = 3, minShared = 3)
    val cases: Seq[(String, () => DataFrame)] = mode match {
      case "gram" => Seq(("d9", () => d9()), ("d16", () => d16()),
        ("t11", () => t11()))
      case _ => Seq(("d2", () => d2()), ("d4", () => d4()),
        ("d14", () => d14()))
    }
    setEager(true); cases.foreach { case (_, f) => time(f()) }
    setEager(false); cases.foreach { case (_, f) => time(f()) }
    cases.foreach { case (n, f) =>
      val on = collection.mutable.ArrayBuffer.empty[Double]
      val off = collection.mutable.ArrayBuffer.empty[Double]
      (1 to reps).foreach { _ =>
        setEager(true); on += time(f())
        setEager(false); off += time(f())
      }
      def fmt(x: Seq[Double]) =
        x.map(v => f"$v%.2f").mkString(",") + f" min=${x.min}%.2f"
      println(s"[ab] $n eager[${fmt(on.toSeq)}] lazy[${fmt(off.toSeq)}]")
    }
    setEager(true)
    Dedup.eagerShingleMaterialize = false
    operators.Curation.eagerGramMaterialize = true
    spark.stop()
  }
}
