package graft.sources

import graft.functions.TextFunctions
import graft.operators.Chunker
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S1: nested-JSON job-postings corpus source + the offline build
  * pipeline (§3.3), Spark-first.
  *
  * The reference reads one nested JSON object and loops over postings
  * serially (/root/reference/build_vectorstore.py:104-161); here the
  * same shape is an explicit schema + `explode`, and every per-posting
  * transform is a column expression, so the build parallelizes per
  * posting for free (SURVEY.md §3.3 "exactly where Spark wins").
  *
  * The semi-open requirement groups (`세부요건`) are MapType — 34
  * distinct keys in the corpus; inferring a struct would make 138
  * sparse columns (SURVEY.md §1.1).
  */
object JobCorpus {

  /** jobs.json-shaped schema (SURVEY.md §1.1). */
  val schema: StructType = StructType(Seq(
    StructField("검색조건", StringType),
    StructField("총_채용공고수", LongType),
    StructField("수집일시", StringType),
    StructField("채용공고목록", ArrayType(StructType(Seq(
      StructField("공고번호", LongType),
      StructField("채용제목", StringType),
      StructField("회사명", StringType),
      StructField("근무지역", StringType),
      StructField("급여조건", StringType),
      StructField("채용공고ID", StringType),
      StructField("채용공고URL", StringType),
      StructField("상세정보", StructType(Seq(
        StructField("직무내용", StringType),
        StructField("세부요건",
          ArrayType(MapType(StringType, ArrayType(StringType)))))))))))))

  /** Read the corpus and explode to one row per posting (G2). A
    * malformed file yields zero rows, mirroring the reference's
    * `{"채용공고목록": []}` fallback (PERMISSIVE mode). */
  def readPostings(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("multiLine", true)
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .json(path)
      .select(explode(coalesce(col("채용공고목록"),
        array().cast(schema("채용공고목록").dataType))).as("p"))
      .select(
        col("p.공고번호").as("posting_no"),
        col("p.채용제목").as("title"),
        col("p.회사명").as("company"),
        col("p.근무지역").as("region"),
        col("p.급여조건").as("salary"),
        col("p.채용공고ID").as("posting_id"),
        col("p.채용공고URL").as("url"),
        col("p.상세정보.직무내용").as("duties"),
        col("p.상세정보.세부요건").as("requirements"))

  /** The posting-level projection half of the build (P1 clean → P2/G3
    * flatten → P3 combine): adds `req_text` and `combined_text`. Split
    * out of [[buildChunks]] so the SQL-expressible part of the build
    * path is oracle-checkable end-to-end (the j1 harness query) while
    * the recursive chunker stays spec/golden-verified. */
  def combine(postings: DataFrame): DataFrame =
    postings
      .withColumn("req_text",
        TextFunctions.flattenRequirements(
          coalesce(col("requirements"),
            array().cast(ArrayType(MapType(StringType, ArrayType(StringType)))))))
      .withColumn("combined_text",
        TextFunctions.combinedText(
          TextFunctions.cleanText(col("title")),
          TextFunctions.cleanText(col("company")),
          TextFunctions.cleanText(col("region")),
          TextFunctions.cleanText(col("salary")),
          TextFunctions.cleanText(col("duties")),
          col("req_text")))

  /** The offline build pipeline: P1 clean → P2 flatten → P3 combine →
    * (external NER boundary merged by the caller via P4) → G1 chunk →
    * P5 ids. Returns one row per chunk with full denormalized posting
    * metadata (the reference's working unit — SURVEY.md §1.2). */
  def buildChunks(postings: DataFrame,
                  chunker: Chunker = Chunker()): DataFrame = {
    val combined = combine(postings)
    chunker(combined, "combined_text")
      .withColumn("chunk_id",
        TextFunctions.chunkId(col("posting_no"), col("chunk_index"), col("chunk")))
      .drop("requirements", "req_text")
  }
}
