package graft

import graft.operators.Rerank
import org.apache.spark.sql.functions._

/** V4 NER-overlap + A9/A10 hybrid combine (SURVEY.md §2.5/§2.6). */
class RerankSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(1).toDF("x")

  test("fieldOverlap: bidirectional substring containment") {
    def ov(u: String, d: String): Int =
      df.select(Rerank.fieldOverlap(lit(u), lit(d))).as[Int].head()
    assert(ov("주방", "주방보조") == 1) // user ⊆ doc
    assert(ov("주방보조", "주방") == 1) // doc ⊆ user
    assert(ov("주방", "경비") == 0)
    assert(ov("", "주방") == 0)        // falsy guard
    assert(ov("주방", "") == 0)
  }

  test("fieldOverlap treats null as empty") {
    val d = Seq((Option.empty[String], Option("x"))).toDF("u", "d")
    assert(d.select(Rerank.fieldOverlap(col("u"), col("d"))).as[Int].head() == 0)
  }

  test("nerOverlap sums field pairs") {
    val score = df.select(Rerank.nerOverlap(Seq(
      (lit("a"), lit("ab")), (lit("x"), lit("y")), (lit("k"), lit("k"))))).as[Double].head()
    assert(score == 2.0)
  }

  test("combined: 0.7·judge + 0.3·rule with null padding to 0") {
    assert(df.select(Rerank.combined(lit(4.0), lit(2.0))).as[Double].head() == 3.4)
    val padded = Seq((Option.empty[Double], 2.0)).toDF("j", "r")
      .select(Rerank.combined(col("j"), col("r"))).as[Double].head()
    assert(math.abs(padded - 0.6) < 1e-12)
  }
}
