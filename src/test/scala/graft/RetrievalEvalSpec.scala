package graft

import graft.operators.RetrievalEval
import org.apache.spark.sql.functions._

/** metricsAtK vs hand-computed IR metrics on tiny fixtures. */
class RetrievalEvalSpec extends SparkSpec {
  import spark.implicits._

  private def log2(x: Double): Double = math.log(x) / math.log(2.0)

  test("metricsAtK matches hand-computed recall/MRR/nDCG at k=3") {
    // q0: approx list [10(rel), 99, 11(rel)], truth {10, 11, 12}
    //   recall = 2/3; MRR = 1/1; DCG = 1/log2(2) + 1/log2(4),
    //   IDCG = 1/log2(2)+1/log2(3)+1/log2(4)
    // q1: nothing relevant → all zeros
    // q2: relevant only at rank 3 → MRR 1/3, DCG = 1/log2(4)
    val results = Seq(
      (0L, 10L, 1), (0L, 99L, 2), (0L, 11L, 3),
      (1L, 98L, 1), (1L, 97L, 2), (1L, 96L, 3),
      (2L, 95L, 1), (2L, 94L, 2), (2L, 12L, 3)
    ).toDF("qid", "vec_id", "knn_rank")
    val truth = Seq(
      (0L, 10L), (0L, 11L), (0L, 12L),
      (1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 12L), (2L, 13L), (2L, 14L)
    ).toDF("qid", "vec_id")
    val got = RetrievalEval.metricsAtK(results, truth, "qid", "vec_id",
        "knn_rank", k = 3)
      .orderBy("qid").as[(Long, Double, Double, Double)].collect().toSeq
    val idcg = 1 / log2(2) + 1 / log2(3) + 1 / log2(4)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0) == ((0L, r6(2.0 / 3), 1.0,
      r6((1 / log2(2) + 1 / log2(4)) / idcg))))
    assert(got(1) == ((1L, 0.0, 0.0, 0.0)))
    assert(got(2) == ((2L, r6(1.0 / 3), r6(1.0 / 3), r6((1 / log2(4)) / idcg))))
  }

  test("metricsAtK: perfect retrieval scores 1.0 everywhere") {
    val results = (1 to 5).map(r => (7L, r.toLong + 100, r))
      .toDF("qid", "vec_id", "knn_rank")
    val truth = (1 to 5).map(r => (7L, r.toLong + 100)).toDF("qid", "vec_id")
    val got = RetrievalEval.metricsAtK(results, truth, "qid", "vec_id",
        "knn_rank", k = 5)
      .as[(Long, Double, Double, Double)].head()
    assert(got == ((7L, 1.0, 1.0, 1.0)))
  }

  test("metricsAtK rejects a degenerate k loudly") {
    val df = Seq((0L, 1L, 1)).toDF("qid", "vec_id", "knn_rank")
    intercept[IllegalArgumentException] {
      RetrievalEval.metricsAtK(df, df.select("qid", "vec_id"),
        "qid", "vec_id", "knn_rank", k = 0)
    }
  }
}
