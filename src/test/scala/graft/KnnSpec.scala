package graft

import graft.operators.Knn
import org.apache.spark.sql.functions._

/** V1-V3 kNN operators against brute-force oracles (SURVEY.md §2.5). */
class KnnSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    val rows = (0 until 50).map { i =>
      (i.toLong, Array(i.toFloat, (i * 2).toFloat, (50 - i).toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  private val q = Array(0.0f, 0.0f, 50.0f) // closest to vec 0

  private def brute(k: Int): Seq[Long] =
    (0 until 50).map { i =>
      val d = math.sqrt(math.pow(i, 2) + math.pow(i * 2, 2) + math.pow(i, 2))
      (i.toLong, d)
    }.sortBy { case (id, d) => (d, id) }.take(k).map(_._1)

  test("exact kNN matches brute force, ties broken by id") {
    val out = Knn.exact(corpus, "embedding", "vec_id",
        typedlit(q.map(_.toDouble)), 10)
      .select("vec_id").as[Long].collect().toSeq
    assert(out == brute(10))
  }

  test("filtered kNN applies the predicate before top-k (no over-fetch)") {
    val out = Knn.filtered(corpus, "embedding", "vec_id",
        col("vec_id") % 2 === 0, typedlit(q.map(_.toDouble)), 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(out == brute(50).filter(_ % 2 == 0).take(5))
    assert(out.forall(_ % 2 == 0))
  }

  test("batch kNN returns k ranked neighbors per query") {
    val queries = corpus.filter($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val out = Knn.batch(corpus, "embedding", "vec_id", queries, "qid", "qv", 4)
      .select("qid", "knn_rank", "vec_id")
      .as[(Long, Int, Long)].collect()
    assert(out.length == 12) // 3 queries × 4
    // rank 1 of each query is the query vector itself (distance 0)
    out.filter(_._2 == 1).foreach { case (qid, _, vid) => assert(qid == vid) }
    // ranks are 1..4 per query
    out.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._2).sorted.toSeq == Seq(1, 2, 3, 4))
    }
  }

  test("batchAgg (bounded top-k aggregation) equals the window form") {
    val queries = corpus.filter($"vec_id" < 4)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    def normalize(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "knn_rank", "vec_id", "dist")
        .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val win = normalize(Knn.batch(corpus, "embedding", "vec_id",
      queries, "qid", "qv", 6))
    val agg = normalize(Knn.batchAgg(corpus, "embedding", "vec_id",
      queries, "qid", "qv", 6))
    assert(agg == win)
  }

  test("batchAgg survives k larger than the corpus") {
    val queries = corpus.filter($"vec_id" === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val out = Knn.batchAgg(corpus, "embedding", "vec_id",
      queries, "qid", "qv", 500)
    assert(out.count() == 50) // whole corpus, no padding
  }

  test("cosine metric ranks by descending similarity") {
    val queries = corpus.filter($"vec_id" === 10)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val out = Knn.batch(corpus, "embedding", "vec_id", queries, "qid", "qv",
        3, metric = "cosine")
      .select("knn_rank", "vec_id").as[(Int, Long)].collect()
    assert(out.find(_._1 == 1).get._2 == 10L) // self is most similar
  }
}
