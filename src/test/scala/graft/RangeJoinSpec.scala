package graft

import graft.operators.RangeJoin

/** Keyless bucketed range join vs brute force. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pairsWithin equals the brute-force inequality join, incl. boundary") {
    val lts = Seq(0L, 10L, 100L, 250L, 251L, -40L)
    val rts = Seq(5L, 95L, 240L, 400L, -35L)
    val left = lts.zipWithIndex.map { case (t, i) => (s"l$i", t) }.toDF("lid", "lts")
    val right = rts.zipWithIndex.map { case (t, i) => (s"r$i", t) }.toDF("rid", "rts")
    val w = 10L
    val expected = (for {
      (lt, li) <- lts.zipWithIndex; (rt, ri) <- rts.zipWithIndex
      if math.abs(lt - rt) <= w
    } yield (s"l$li", s"r$ri")).toSet
    val got = RangeJoin.pairsWithin(left, right, "lts", "rts", w)
      .select("lid", "rid").as[(String, String)].collect()
    assert(got.length == got.toSet.size, "no duplicate pairs")
    assert(got.toSet == expected)
  }

  test("property: pairsWithin equals brute force on random timestamp sets") {
    import org.scalacheck.Gen
    val gen = for {
      lts <- Gen.listOfN(30, Gen.chooseNum(-500L, 500L))
      rts <- Gen.listOfN(30, Gen.chooseNum(-500L, 500L))
      w <- Gen.chooseNum(1L, 60L)
    } yield (lts, rts, w)
    PropHelper.forAll(gen, n = 25) { case (lts, rts, w) =>
      val left = lts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("lid", "lts")
      val right = rts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("rid", "rts")
      val expected = (for {
        (lt, li) <- lts.zipWithIndex; (rt, ri) <- rts.zipWithIndex
        if math.abs(lt - rt) <= w
      } yield (li, ri)).toSet
      val got = RangeJoin.pairsWithin(left, right, "lts", "rts", w)
        .select("lid", "rid").as[(Int, Int)].collect()
      assert(got.length == got.toSet.size)
      assert(got.toSet == expected, s"w=$w")
    }
  }

  test("pairsWithin plans an equi-join on buckets, not a nested loop") {
    val left = (1 to 50).map(i => (i, i * 7L)).toDF("lid", "lts")
    val right = (1 to 50).map(i => (i, i * 11L)).toDF("rid", "rts")
    val plan = RangeJoin.pairsWithin(left, right, "lts", "rts", 20L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
  }
}
