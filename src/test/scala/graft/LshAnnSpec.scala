package graft

import graft.operators.{Knn, LshAnn}
import org.apache.spark.sql.functions._

/** MLlib LSH ANN vs the exact operators (seeded, so deterministic). */
class LshAnnSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (0 until 100).map { i =>
    (i.toLong, Array((i % 10).toFloat, (i / 10).toFloat))
  }.toDF("vec_id", "embedding")

  test("approxNearest finds the exact vector for a self-query") {
    val out = LshAnn.approxNearest(corpus, "embedding", "vec_id",
        Seq(3.0, 4.0), k = 5)
      .orderBy("dist").select("vec_id", "dist")
      .as[(Long, Double)].collect()
    assert(out.head._1 == 43L) // (3,4) = id 43
    assert(out.head._2 == 0.0)
  }

  test("approxNearest top-k is a subset of a slightly larger exact top-k") {
    val qv = Seq(5.2, 5.1)
    val approx = LshAnn.approxNearest(corpus, "embedding", "vec_id", qv, 5)
      .select("vec_id").as[Long].collect().toSet
    val exact = Knn.exact(corpus, "embedding", "vec_id",
        typedlit(qv), 25)
      .select("vec_id").as[Long].collect().toSet
    assert(approx.subsetOf(exact))
  }

  test("approxSelfJoin returns only pairs within the distance threshold") {
    val pairs = LshAnn.approxSelfJoin(corpus, "embedding", "vec_id",
        threshold = 1.01, numTables = 6)
      .as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, d) =>
      assert(a < b)
      assert(d <= 1.01)
    }
    // grid neighbors at distance exactly 1 must appear (high-recall config)
    assert(pairs.exists { case (a, b, d) => d == 1.0 })
  }
}
