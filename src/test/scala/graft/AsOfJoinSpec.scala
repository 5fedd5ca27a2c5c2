package graft

import graft.operators.AsOfJoin

/** As-of join: last right value at-or-before each left timestamp. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("lastBefore: inclusive bound, latest-wins, per-key isolation, left join") {
    val left = Seq(
      ("a", 1L, 5L),   // before any right row -> null
      ("b", 1L, 10L),  // equal ts -> inclusive, sees 100
      ("c", 1L, 25L),  // after both -> latest (200)
      ("d", 2L, 10L),  // right for key 2 is later -> null
      ("e", 3L, 99L)   // key with no right rows at all -> null
    ).toDF("lid", "k", "ts")
    val right = Seq(
      (1L, 10L, 100.0), (1L, 20L, 200.0), (2L, 50L, 500.0)
    ).toDF("k", "ts", "v")

    val out = AsOfJoin.lastBefore(left, right, "k", "ts", "ts", "v")
      .select("lid", "asof_value")
      .as[(String, Option[Double])].collect().toMap
    assert(out == Map(
      "a" -> None, "b" -> Some(100.0), "c" -> Some(200.0),
      "d" -> None, "e" -> None))
  }

  test("lastBefore: a matched right row with NULL value yields null (no substitution)") {
    // native-ASOF semantics: the latest matched ROW wins even when its
    // value is null — an older non-null value must NOT leak through
    val left = Seq(("a", 1L, 25L)).toDF("lid", "k", "ts")
    val right = Seq(
      (1L, 10L, Option(100.0)), (1L, 20L, Option.empty[Double])
    ).toDF("k", "ts", "v")
    val out = AsOfJoin.lastBefore(left, right, "k", "ts", "ts", "v")
      .select("lid", "asof_value")
      .as[(String, Option[Double])].collect().toMap
    assert(out == Map("a" -> None))
  }

  test("lastBefore: NULL keys never match (native-ASOF key semantics)") {
    val left = Seq(("a", Option.empty[Long], 25L), ("b", Option(1L), 25L))
      .toDF("lid", "k", "ts")
    val right = Seq((Option.empty[Long], 10L, 7.0), (Option(1L), 10L, 9.0))
      .toDF("k", "ts", "v")
    val out = AsOfJoin.lastBefore(left, right, "k", "ts", "ts", "v")
      .select("lid", "asof_value")
      .as[(String, Option[Double])].collect().toMap
    // null-key left row still emits (left join) but matches nothing
    assert(out == Map("a" -> None, "b" -> Some(9.0)))
  }

  test("property: lastBefore equals brute force on random series (incl. null values)") {
    import org.scalacheck.Gen
    val gen = for {
      ls <- Gen.listOfN(40, Gen.zip(Gen.chooseNum(0L, 4L), Gen.chooseNum(0L, 50L)))
      rs <- Gen.listOfN(25, Gen.zip(Gen.chooseNum(0L, 4L), Gen.chooseNum(0L, 50L),
        Gen.option(Gen.chooseNum(1, 99))))
    } yield (ls, rs)
    PropHelper.forAll(gen, n = 20) { case (ls, rs) =>
      // dedupe right per (k, ts): keep max value (Some > None) — the
      // determinism contract the operator documents
      val rDeduped = rs.groupBy(r => (r._1, r._2)).map { case ((k, t), g) =>
        (k, t, g.map(_._3).maxBy(_.getOrElse(Int.MinValue)))
      }.toSeq
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i, k, t) }
        .toDF("lid", "k", "ts")
      val right = spark.createDataFrame(rDeduped).toDF("k", "ts", "v")
      val expected = ls.zipWithIndex.map { case ((k, t), i) =>
        val prior = rDeduped.filter(r => r._1 == k && r._2 <= t)
        i -> (if (prior.isEmpty) None
              else prior.maxBy(_._2)._3.map(_.toDouble))
      }.toMap
      val got = AsOfJoin.lastBefore(left, right, "k", "ts", "ts", "v")
        .select("lid", "asof_value")
        .as[(Int, Option[Int])].collect()
        .map { case (i, v) => i -> v.map(_.toDouble) }.toMap
      assert(got == expected)
    }
  }

  test("lastBefore is deterministic across partitionings and joins nothing") {
    val left = (1 to 300).map(i => (i, i.toLong % 7, (i * 13 % 101).toLong))
      .toDF("lid", "k", "ts")
    val right = (1 to 100).map(i => (i.toLong % 7, (i * 29 % 101).toLong, i * 1.0))
      .toDF("k", "ts", "v")
      .groupBy("k", "ts").agg(org.apache.spark.sql.functions.max("v").as("v"))
    def run(parts: Int) =
      AsOfJoin.lastBefore(left.repartition(parts), right, "k", "ts", "ts", "v")
        .orderBy("lid").collect().toSeq
    assert(run(1) == run(13))
    val plan = AsOfJoin.lastBefore(left, right, "k", "ts", "ts", "v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
  }
}
