package graft.api

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed response model (SURVEY.md §1.4): the reference's Pydantic
  * `JobPosting` (/root/reference/main.py:66-90) as a case class —
  * everything string-typed like the original (its query path has no
  * numeric semantics), absence rendered with the reference's sentinel
  * defaults ONLY at this final projection (§1.5: engine-internal
  * schemas keep real nulls).
  */
final case class JobPosting(
    id: String,
    location: String,
    company: String,
    title: String,
    salary: String,
    workingHours: String,
    description: String,
    rank: Int)

object Response {

  /** P10 response projection (main.py:457-469): per-field sentinel
    * defaults; description falls back to a cleaned text prefix. */
  def project(ranked: DataFrame): Dataset[JobPosting] = {
    import ranked.sparkSession.implicits._
    def d(c: String, default: String) =
      coalesce(nullif(trim(col(c)), lit("")), lit(default))
    ranked.select(
      d("posting_id", "no_id").as("id"),
      d("region", "정보없음").as("location"),
      d("company", "정보없음").as("company"),
      d("title", "정보없음").as("title"),
      d("salary", "정보없음").as("salary"),
      d("working_hours", "정보없음").as("workingHours"),
      coalesce(nullif(trim(col("description")), lit("")),
        regexp_replace(substring(col("chunk"), 1, 100), "\n", " "),
        lit("상세정보 없음")).as("description"),
      col("rank").cast("int").as("rank")
    ).as[JobPosting]
  }
}
