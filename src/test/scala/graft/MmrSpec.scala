package graft

import graft.operators.Mmr

class MmrSpec extends SparkSpec {

  private def cand(rows: Seq[(Long, Array[Double], Double)]) = {
    import spark.implicits._
    rows.toDF("id", "emb", "rel")
  }

  test("picks the redundant near-clone last despite higher rel") {
    // a and a' nearly identical; b orthogonal with lower rel. Pure
    // rel-ranking keeps (a, a'); MMR at λ=0.5 swaps in b second.
    val df = cand(Seq(
      (1L, Array(1.0, 0.0), 0.99),
      (2L, Array(0.999, 0.01), 0.98),
      (3L, Array(0.0, 1.0), 0.60)))
    val out = Mmr.diversify(df, "id", "emb", "rel", k = 2, lambda = 0.5)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 3L))
  }

  test("rank 1 is the max-rel row and its score is lambda*rel") {
    val df = cand(Seq(
      (10L, Array(1.0, 0.0), 0.5),
      (11L, Array(0.0, 1.0), 0.9)))
    val r1 = Mmr.diversify(df, "id", "emb", "rel", k = 1, lambda = 0.7)
      .collect()(0)
    assert(r1.getLong(1) == 11L)
    assert(math.abs(r1.getDouble(3) - 0.7 * 0.9) < 1e-12)
  }

  test("equal scores tie-break on lower id") {
    val df = cand(Seq(
      (7L, Array(1.0, 0.0), 0.8),
      (3L, Array(0.0, 1.0), 0.8)))
    val out = Mmr.diversify(df, "id", "emb", "rel", k = 2, lambda = 1.0)
      .orderBy("rank").collect()
    // λ=1 → diversity ignored; both scores 0.8 → id 3 first
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 7L))
  }

  test("k larger than candidate set returns all, ranked") {
    val df = cand(Seq(
      (1L, Array(1.0, 0.0), 0.9),
      (2L, Array(0.0, 1.0), 0.1)))
    val out = Mmr.diversify(df, "id", "emb", "rel", k = 10, lambda = 0.7)
    assert(out.count() == 2)
    assert(out.select("rank").collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
  }

  test("candidate cap fails loudly") {
    val df = cand((1L to 20L).map(i => (i, Array(1.0, 0.0), 0.5)))
    val e = intercept[IllegalArgumentException] {
      Mmr.diversify(df, "id", "emb", "rel", k = 2, lambda = 0.5,
        maxCandidates = 10)
    }
    assert(e.getMessage.contains("maxCandidates"))
  }

  test("all-negative cosines keep their true (negative) diversity term") {
    // b points AWAY from the first pick a: cos(b,a) = -1, so b's MMR
    // score is λ·rel − (1−λ)·(−1) = λ·rel + (1−λ). A zero-clamped
    // maxSim would score b as just λ·rel and wrongly pick c instead.
    val df = cand(Seq(
      (1L, Array(1.0, 0.0), 0.9),
      (2L, Array(-1.0, 0.0), 0.1),
      (3L, Array(0.0, 1.0), 0.2)))
    val out = Mmr.diversify(df, "id", "emb", "rel", k = 2, lambda = 0.5)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L))
    assert(math.abs(out(1).getDouble(3) - (0.5 * 0.1 + 0.5)) < 1e-12)
  }

  test("zero-norm candidate never yields NaN") {
    val df = cand(Seq(
      (1L, Array(1.0, 0.0), 0.9),
      (2L, Array(0.0, 0.0), 0.5)))
    val out = Mmr.diversify(df, "id", "emb", "rel", k = 2, lambda = 0.5)
      .collect()
    assert(out.forall(r => !r.getDouble(3).isNaN))
  }
}
