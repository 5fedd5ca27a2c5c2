package graft

import graft.operators.HeavyHitters
import org.apache.spark.sql.functions._

import scala.util.Random

/** Misra-Gries heavy hitters vs naive groupBy recomputation. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish skewed items: item i appears ~N/(i+1) times, shuffled
    * and spread over several partitions so partial sketches and the
    * mergeable-summaries merge path are both exercised. */
  private def skewed(nDistinct: Int, seed: Int): Seq[String] = {
    val r = new Random(seed)
    r.shuffle((0 until nDistinct).flatMap(i =>
      Seq.fill(2000 / (i + 1))(s"w$i")))
  }

  private def naive(items: Seq[String], k: Int): Map[String, Long] = {
    val n = items.size
    items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, f) => f * k > n }.toMap
  }

  test("exact equals the naive groupBy answer, tight capacity = k") {
    for (seed <- 1 to 3; k <- Seq(5, 20, 50)) {
      val items = skewed(100, seed)
      val df = items.toDF("word").repartition(7)
      val got = HeavyHitters.exact(df, "word", k, capacity = k)
        .as[(String, Long)].collect().toMap
      assert(got == naive(items, k), s"seed=$seed k=$k")
    }
  }

  test("candidates is a superset of every true heavy hitter") {
    for (seed <- 1 to 3) {
      val items = skewed(200, seed)
      val df = items.toDF("word").repartition(11)
      // capacity 10 → guarantee covers freq > n/11
      val cand = HeavyHitters.candidates(df, "word", capacity = 10).toSet
      assert(cand.size <= 10)
      val mustHave = naive(items, 11).keySet
      assert(mustHave.subsetOf(cand),
        s"seed=$seed: missing ${mustHave -- cand}")
    }
  }

  test("capacity 1e5 keeps the plan constant-size (broadcast semi-join, no literal list)") {
    val items = skewed(100, seed = 9)
    val df = items.toDF("word").repartition(7)
    val out = HeavyHitters.exact(df, "word", k = 5, capacity = 100000)
    // correctness unchanged at huge capacity (more slack, same answer)
    assert(out.as[(String, Long)].collect().toMap == naive(items, 5))
    // the recount must JOIN a candidates relation, not inline one
    // string literal per candidate: a 10⁵-literal IN list would make
    // the plan size scale with capacity
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"expected a broadcast semi-join recount, got:\n$plan")
    assert(!plan.contains(" IN ("), "literal IN list leaked into the plan")
    assert(plan.length < 20000, s"plan size ${plan.length} scales with capacity")
  }

  test("threshold is strict and layout-independent") {
    // 4 items × 25 occurrences each, n=100: freq*4 > 100 is FALSE
    // (25*4 = 100), so k=4 reports nothing; k=5 reports all four.
    val items = (0 until 4).flatMap(i => Seq.fill(25)(s"x$i"))
    for (parts <- Seq(1, 3, 13)) {
      val df = items.toDF("word").repartition(parts)
      assert(HeavyHitters.exact(df, "word", k = 4).isEmpty, s"parts=$parts")
      val all = HeavyHitters.exact(df, "word", k = 5)
        .as[(String, Long)].collect().toMap
      assert(all == Map("x0" -> 25L, "x1" -> 25L, "x2" -> 25L, "x3" -> 25L))
    }
  }

  test("property: exact equals naive for random multisets, capacities, thresholds") {
    import org.scalacheck.Gen
    val gen = for {
      nDistinct <- Gen.choose(1, 40)
      items <- Gen.listOfN(300, Gen.choose(0, nDistinct - 1).map(i => s"i$i"))
      k <- Gen.choose(2, 30)
      extraCap <- Gen.choose(0, 10)
      parts <- Gen.choose(1, 9)
    } yield (items, k, k + extraCap, parts)
    PropHelper.forAll(gen, n = 12) { case (items, k, cap, parts) =>
      val got = HeavyHitters.exact(items.toDF("w").repartition(parts), "w", k,
          capacity = cap)
        .as[(String, Long)].collect().toMap
      assert(got == naive(items, k), s"k=$k cap=$cap parts=$parts")
    }
  }

  test("nulls are ignored and empty input yields an empty result") {
    val df = Seq(Some("a"), None, Some("a"), Some("b"), None)
      .toDF("word")
    // n counts non-null only (3): "a" freq 2, 2*2 > 3 → reported
    val got = HeavyHitters.exact(df, "word", k = 2)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 2L))
    assert(HeavyHitters.exact(Seq.empty[String].toDF("word"), "word", 2).isEmpty)
  }
}
