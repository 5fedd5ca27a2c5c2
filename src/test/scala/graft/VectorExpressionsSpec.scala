package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Native fused expressions vs the HOF specification forms: bit-for-bit
  * agreement (same left fold in double), plus null/mismatch semantics. */
class VectorExpressionsSpec extends SparkSpec {
  import PropHelper.forAll
  import spark.implicits._

  private val vecPair: Gen[(List[Double], List[Double])] = for {
    n <- Gen.chooseNum(1, 64)
    a <- Gen.listOfN(n, Gen.chooseNum(-100.0, 100.0))
    b <- Gen.listOfN(n, Gen.chooseNum(-100.0, 100.0))
  } yield (a, b)

  test("native == HOF bit-for-bit on double arrays") {
    forAll(vecPair, 30) { case (a, b) =>
      val row = Seq((a, b)).toDF("a", "b").select(
        VectorFunctions.dot(col("a"), col("b")),
        VectorFunctions.dotHof(col("a"), col("b")),
        VectorFunctions.l2(col("a"), col("b")),
        VectorFunctions.l2Hof(col("a"), col("b")),
        VectorFunctions.cosine(col("a"), col("b")),
        VectorFunctions.cosineHof(col("a"), col("b"))
      ).as[(Double, Double, Double, Double, Double, Double)].head()
      assert(row._1 == row._2, "dot")   // exact equality, not epsilon
      assert(row._3 == row._4, "l2")
      assert(row._5 == row._6, "cosine")
    }
  }

  test("native == HOF on float arrays (the embeddings schema)") {
    val a = Array(1.5f, -2.25f, 3.125f)
    val b = Array(0.5f, 4.75f, -1.125f)
    val row = Seq((a, b)).toDF("a", "b").select(
      VectorFunctions.l2(col("a"), col("b")),
      VectorFunctions.l2Hof(col("a"), col("b")),
      VectorFunctions.cosine(col("a"), col("b")),
      VectorFunctions.cosineHof(col("a"), col("b"))
    ).as[(Double, Double, Double, Double)].head()
    assert(row._1 == row._2)
    assert(row._3 == row._4)
  }

  test("length mismatch yields null, zero-norm cosine yields 0") {
    val out = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
      .select(VectorFunctions.dot(col("a"), col("b")).as("d"))
      .select(col("d").isNull).as[Boolean].head()
    assert(out)
    val z = Seq((Seq(0.0, 0.0), Seq(1.0, 1.0))).toDF("a", "b")
      .select(VectorFunctions.cosine(col("a"), col("b"))).as[Double].head()
    assert(z == 0.0)
  }

  test("interpreted eval path agrees with codegen path") {
    // force interpreted: evaluate via a filter on a tiny literal frame
    val a = Seq(3.0, 4.0)
    val df = Seq((a, Seq(0.0, 0.0))).toDF("a", "b")
    assert(df.select(VectorFunctions.l2(col("a"), col("b"))).as[Double].head() == 5.0)
  }
}
