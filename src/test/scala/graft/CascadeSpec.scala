package graft

import graft.operators.{CascadeConfig, MultiStageSearch}
import org.apache.spark.sql.functions._

/** §3.1 flagship cascade: adaptive relaxation + priority dedup +
  * hybrid rerank + top-N rank over a small in-memory corpus. */
class CascadeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    val docs = Seq(
      (0L, "join job in the row district", Array(0.0f, 0.0f)),
      (1L, "join work near the row area", Array(0.1f, 0.0f)),
      (2L, "merge position in the row zone", Array(0.2f, 0.0f)),
      (3L, "sort role in the key sector", Array(5.0f, 5.0f)),
      (4L, "filter opening in the line region", Array(6.0f, 6.0f)),
      (5L, "unrelated document entirely", Array(9.0f, 9.0f)))
    docs.toDF("doc_id", "text", "embedding")
      .withColumn("qv", typedlit(Seq(0.0, 0.0)))
  }

  test("returns at most finalN ranked rows, rank contiguous from 1") {
    val search = new MultiStageSearch(corpus, "doc_id", "text", "embedding",
      CascadeConfig(topK = 3, finalN = 3))
    val out = search.search("looking for a join job in the row area", col("qv"))
      .select("rank", "doc_id", "score")
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(out.length <= 3 && out.nonEmpty)
    assert(out.map(_._1).toSeq == (1 to out.length))
    // scores are non-increasing in rank order
    assert(out.map(_._3).sliding(2).forall {
      case Array(a, b) => a >= b
      case _ => true
    })
  }

  test("each doc_id appears at most once (keep-first dedup)") {
    val search = new MultiStageSearch(corpus, "doc_id", "text", "embedding",
      CascadeConfig(topK = 4, finalN = 6, fallbackThreshold = 10))
    val ids = search.search("join row", col("qv"))
      .select("doc_id").as[Long].collect()
    assert(ids.distinct.length == ids.length)
  }

  test("query with no vocabulary hits still returns results (fallback stage)") {
    val search = new MultiStageSearch(corpus, "doc_id", "text", "embedding",
      CascadeConfig(topK = 3, finalN = 3))
    val out = search.search("기타 문의", col("qv")).collect()
    assert(out.nonEmpty) // unfiltered kNN fallback fired
  }

  test("searchRemind (scan-then-filter composition) ranks matching docs first") {
    val search = new MultiStageSearch(corpus, "doc_id", "text", "embedding",
      CascadeConfig(finalN = 3, relaxThreshold = 1))
    val out = search.searchRemind("join row", col("qv"), scanK = 6)
      .select("rank", "doc_id").as[(Int, Long)].collect().sortBy(_._1)
    assert(out.nonEmpty && out.length <= 3)
    // post-filter kept only docs containing both terms → ids 0 and 1
    assert(out.map(_._2).toSet.subsetOf(Set(0L, 1L)))
  }

  test("searchRemind falls back to the whole pool when the filter starves") {
    val search = new MultiStageSearch(corpus, "doc_id", "text", "embedding",
      CascadeConfig(finalN = 5, relaxThreshold = 3))
    val out = search.searchRemind("vector 없는 조건", col("qv"), scanK = 6)
    assert(out.count() > 0) // nothing matches the filter → unfiltered pool
  }

  test("searchRemindFixed equals searchRemind when the filter survives the gate") {
    val search = new MultiStageSearch(corpus, "doc_id", "text", "embedding",
      CascadeConfig(relaxThreshold = 2, finalN = 4))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("rank", "doc_id", "stage_rank").collect().toSeq
    val q = "looking for a join job in the row area"
    assert(rows(search.searchRemindFixed(q, col("qv"), scanK = 6)) ==
      rows(search.searchRemind(q, col("qv"), scanK = 6)))
  }

  test("searchRemindFixed equals searchRemind when the gate falls back") {
    // only one doc contains both terms -> below relaxThreshold=5 ->
    // both paths must fall back to the unfiltered pool
    val search = new MultiStageSearch(corpus, "doc_id", "text", "embedding",
      CascadeConfig(relaxThreshold = 5, finalN = 4))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("rank", "doc_id", "stage_rank").collect().toSeq
    val q = "looking for a sort job in the key area"
    assert(rows(search.searchRemindFixed(q, col("qv"), scanK = 6)) ==
      rows(search.searchRemind(q, col("qv"), scanK = 6)))
  }

  test("strict stage results outrank later-stage results for equal scores") {
    val search = new MultiStageSearch(corpus, "doc_id", "text", "embedding",
      CascadeConfig(topK = 2, finalN = 6, fallbackThreshold = 10))
    val out = search.search("join row", col("qv"))
      .select("doc_id", "stage_rank").as[(Long, Int)].collect()
    // docs matching both terms came from stage 1
    assert(out.filter(_._1 <= 1).forall(_._2 == 1))
  }
}
