package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The real inventory lives in [[Queries]]; this object is the stable
  * facade the harness calls.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001: the multi-stage
    * relaxation-cascade semantic search (SURVEY.md §3.1). */
  def entry(spark: SparkSession): DataFrame =
    Queries.cascade(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map(q => q.name -> q.impl).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (recursive chunker, adaptive cascade) → rows-only check. */
  def oracleSql: Map[String, String] =
    Queries.all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
