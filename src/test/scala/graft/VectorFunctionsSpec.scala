package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Vector distance kernels (SURVEY.md §1.3/§2.5) — hand-checked values
  * + metric properties over generated vectors. */
class VectorFunctionsSpec extends SparkSpec {
  import PropHelper.forAll
  import spark.implicits._

  private def eval2(a: Seq[Double], b: Seq[Double],
                    f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column): Double =
    Seq((a, b)).toDF("a", "b").select(f(col("a"), col("b"))).as[Double].head()

  test("dot, l2, cosine on hand-computed values") {
    assert(eval2(Seq(1, 2, 3), Seq(4, 5, 6), VectorFunctions.dot) == 32.0)
    assert(eval2(Seq(0, 3), Seq(4, 0), VectorFunctions.l2) == 5.0)
    assert(math.abs(eval2(Seq(1, 0), Seq(1, 0), VectorFunctions.cosine) - 1.0) < 1e-12)
    assert(eval2(Seq(1, 0), Seq(0, 1), VectorFunctions.cosine) == 0.0)
  }

  test("cosine of a zero vector is 0, never NaN") {
    assert(eval2(Seq(0, 0), Seq(1, 1), VectorFunctions.cosine) == 0.0)
  }

  private val vecPair: Gen[(List[Double], List[Double])] = for {
    n <- Gen.chooseNum(1, 16)
    a <- Gen.listOfN(n, Gen.chooseNum(-10.0, 10.0))
    b <- Gen.listOfN(n, Gen.chooseNum(-10.0, 10.0))
  } yield (a, b)

  test("property: l2 symmetry, non-negativity, identity") {
    forAll(vecPair, 40) { case (a, b) =>
      val dab = eval2(a, b, VectorFunctions.l2)
      val dba = eval2(b, a, VectorFunctions.l2)
      assert(math.abs(dab - dba) < 1e-9)
      assert(dab >= 0.0)
      assert(eval2(a, a, VectorFunctions.l2) < 1e-9)
    }
  }

  test("property: cosine bounded in [-1, 1]") {
    forAll(vecPair, 40) { case (a, b) =>
      val c = eval2(a, b, VectorFunctions.cosine)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
  }
}
