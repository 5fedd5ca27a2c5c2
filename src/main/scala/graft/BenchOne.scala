package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: time a subset of queries with repetitions.
  * Usage: sbt "runMain graft.BenchOne d8_embedding_neardup_grid s1_ann_cosine_topk"
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  * SPARK_GRAFT_REPS (default 3), SPARK_GRAFT_EXPLAIN=1 to dump the plan.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // timing tool → gates off like Bench; SPARK_GRAFT_IDENTITY_GATES=1
    // re-enables for measuring the verification cost itself
    Queries.identityGates = sys.env.contains("SPARK_GRAFT_IDENTITY_GATES")
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_pricing_summary")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
        println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      // Timed action = the noop sink, matching Bench (guide §1.4): under
      // count() the optimizer prunes computed columns and drops final
      // sorts, so expression-heavy queries time a fraction of their
      // real cost. SPARK_GRAFT_BENCHONE_ACTION=count restores the old
      // behavior for cross-checking.
      val useCount = sys.env.get("SPARK_GRAFT_BENCHONE_ACTION").contains("count")
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        if (useCount) { df.count(); () }
        else df.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        SessionHygiene.dropCachedBlocks(spark)
        System.gc()
        sec
      }
      println(f"[benchone] $name " +
        times.map(t => f"$t%.2f").mkString("times=[", ", ", "]"))
    }
    spark.stop()
  }
}
