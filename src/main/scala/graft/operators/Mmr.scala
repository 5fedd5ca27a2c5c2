package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Maximal-Marginal-Relevance diversification of a retrieval stage
  * (Carbonell & Goldstein 1998): greedily pick the candidate maximizing
  * `λ·rel − (1−λ)·max_{s∈selected} cos(cand, s)` — the standard
  * redundancy-aware re-rank a retrieval cascade applies to its final
  * page, and the diversity-sampling step of a training-data pipeline.
  *
  * MMR is inherently SEQUENTIAL-greedy: each pick depends on all
  * previous picks, so there is nothing to distribute across k rounds —
  * a distributed formulation would run k near-empty jobs. The
  * scale-correct shape is therefore the same as the cascade's stage
  * collects: the UPSTREAM top-N candidate generation is the
  * distributed part (TakeOrderedAndProject over the corpus / an IVF
  * probe), and the ≤`maxCandidates` survivors are selected
  * driver-side, bounded by design. Cost: O(N·k) cosines over vectors
  * already in memory.
  *
  * Determinism contract (oracle-checkable): cosines are
  * ascending-index left folds in double — bit-identical to
  * [[graft.functions.VectorFunctions.cosine]] and its DuckDB mirror —
  * and ties break on (score desc, id asc).
  */
object Mmr {

  /** Mirror of VectorFunctions.cosine for driver-resident vectors:
    * one ascending pass, zero-norm → 0.0 (never NaN). */
  private[graft] def cosLocal(a: Array[Double], b: Array[Double]): Double = {
    require(a.length == b.length, s"dim ${a.length} != ${b.length}")
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    val nn = math.sqrt(na) * math.sqrt(nb)
    if (nn == 0.0) 0.0 else d / nn
  }

  /** Diversify `candidates` (idCol, embCol, relCol) down to `k` rows.
    * Returns (rank, idCol, rel, score): rank 1..k in pick order; the
    * first pick's score is λ·rel (empty-selection diversity term is 0).
    * The candidate set must be bounded — this is a POST-top-N operator,
    * not a corpus operator; `maxCandidates` fails loudly if misused. */
  def diversify(candidates: DataFrame, idCol: String, embCol: String,
                relCol: String, k: Int, lambda: Double,
                maxCandidates: Int = 4096): DataFrame = {
    require(lambda >= 0 && lambda <= 1, s"lambda $lambda outside [0,1]")
    require(k >= 1, "k must be >= 1")
    val spark = candidates.sparkSession
    // limit BEFORE collect so the guard trips before the driver holds an
    // unbounded result: one extra row is enough to prove the overflow.
    val rows: Array[Row] = candidates
      .select(col(idCol).cast("long"), col(embCol).cast("array<double>"),
        col(relCol).cast("double"))
      .limit(maxCandidates + 1)
      .collect()
    require(rows.length <= maxCandidates,
      s"more than maxCandidates=$maxCandidates candidates — " +
        "run MMR after a top-N stage, not on a corpus")
    val n = rows.length
    val ids = Array.tabulate(n)(i => rows(i).getLong(0))
    val embs = Array.tabulate(n)(i => rows(i).getSeq[Double](1).toArray)
    val rels = Array.tabulate(n)(i => rows(i).getDouble(2))
    // maxSim(i) = max cosine between candidate i and any selected row,
    // updated incrementally after each pick: O(N) cosines per round.
    // NegativeInfinity (not 0) so an all-negative cosine row keeps its
    // true max — standard MMR and the oracle's max(sim) both go
    // negative there; the round==1 guard covers the empty selection.
    val maxSim = Array.fill(n)(Double.NegativeInfinity)
    val taken = Array.fill(n)(false)
    val picks = Array.newBuilder[(Int, Long, Double, Double)]
    var round = 1
    while (round <= math.min(k, n)) {
      var best = -1
      var bestScore = 0.0
      var i = 0
      while (i < n) {
        if (!taken(i)) {
          val div = if (round == 1) 0.0 else maxSim(i)
          val s = lambda * rels(i) - (1 - lambda) * div
          // tie-break: higher score, then lower id
          if (best < 0 || s > bestScore ||
              (s == bestScore && ids(i) < ids(best))) {
            best = i; bestScore = s
          }
        }
        i += 1
      }
      taken(best) = true
      picks += ((round, ids(best), rels(best), bestScore))
      var j = 0
      while (j < n) {
        if (!taken(j)) {
          val sim = cosLocal(embs(j), embs(best))
          if (sim > maxSim(j)) maxSim(j) = sim
        }
        j += 1
      }
      round += 1
    }
    import spark.implicits._
    picks.result().toSeq.toDF("rank", idCol, "rel", "score")
  }
}
