package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact heavy hitters over a 100 TB item stream without a
  * full-vocabulary shuffle (north-star curation surface: vocabulary
  * health checks, boilerplate-token discovery, stop-gram caps for the
  * d9/t11 gram joins).
  *
  * The naive form — `groupBy(item).count.filter(freq > n/k)` —
  * shuffles one row per DISTINCT item: at web-corpus scale the token
  * vocabulary (typos, hashes, numbers) is billions of keys, almost
  * all of which lose the filter. This operator is the classic
  * two-phase fix:
  *
  *   1. '''Sketch''': one pass with a Misra-Gries summary of
  *      `capacity` counters per partition, merged pairwise
  *      (mergeable-summaries semantics, Agarwal et al. 2012): any
  *      item with true frequency > n/(capacity+1) is GUARANTEED to
  *      survive into the merged candidate set, so with
  *      capacity ≥ k the candidates are a superset of every
  *      freq > n/k hitter. The exchange carries ≤ capacity counters
  *      per partition — constant, corpus-independent.
  *   2. '''Verify''': exact counts of the ≤ capacity candidates only.
  *      A broadcast semi-join against the candidate list makes the
  *      re-count a narrow map-side filter (almost every row drops
  *      before the exchange) followed by a partial-agg shuffle of
  *      ≤ capacity keys — and keeps the PLAN constant-size at any
  *      capacity (a literal IN list would inline one string literal
  *      per candidate, blowing up analysis/codegen at capacity ~10⁵).
  *
  * The sketch itself is partition-order-dependent (which EXTRA
  * sub-threshold candidates survive varies), but the verified output
  * is not: phase 2 recounts exactly and keeps strictly-over-threshold
  * items, so the result equals the naive groupBy answer row-for-row —
  * which is what lets a plain SQL oracle check it.
  *
  * The `Aggregator` (not a custom SparkPlan) is deliberate, same
  * rationale as [[TopK]]: ObjectHashAggregate keeps the counter map
  * live per partition and serializes only at the exchange.
  */
object HeavyHitters {

  /** Mutable single-field buffer: the counter map lives as one object
    * per partition inside ObjectHashAggregate; the product encoder
    * (MapType) serializes it only across the exchange. */
  final case class Buf(var counts: Map[String, Long])

  /** Misra-Gries summary of at most `capacity` counters.
    * Guarantee: est(x) ∈ [freq(x) − n/(capacity+1), freq(x)], so any
    * x with freq(x) > n/(capacity+1) has est > 0 and is present. The
    * merge keeps the bound additive across partitions: sum counters,
    * then subtract the (capacity+1)-th largest count from all and
    * drop the non-positive — the standard mergeable-summaries rule. */
  final class MisraGries(capacity: Int)
      extends Aggregator[String, Buf, Seq[String]] {
    require(capacity >= 1, s"capacity $capacity must be >= 1")

    override def zero: Buf = Buf(Map.empty)

    override def reduce(b: Buf, item: String): Buf = {
      val c = b.counts
      c.get(item) match {
        case Some(v) => b.counts = c.updated(item, v + 1L)
        case None if c.size < capacity => b.counts = c.updated(item, 1L)
        case None =>
          // decrement-all step: O(capacity), amortized O(1)/row since
          // each unit of count admitted pays for at most one decrement
          b.counts = c.collect { case (k, v) if v > 1L => k -> (v - 1L) }
      }
      b
    }

    override def merge(a: Buf, b: Buf): Buf = {
      val combined = (a.counts.keySet ++ b.counts.keySet).iterator.map { k =>
        k -> (a.counts.getOrElse(k, 0L) + b.counts.getOrElse(k, 0L))
      }.toMap
      a.counts =
        if (combined.size <= capacity) combined
        else {
          val cut = combined.values.toArray.sorted(Ordering[Long].reverse)
            .apply(capacity) // (capacity+1)-th largest
          combined.collect { case (k, v) if v > cut => k -> (v - cut) }
        }
      a
    }

    override def finish(b: Buf): Seq[String] = b.counts.keys.toSeq.sorted

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }

  /** Candidate items only (phase 1) — exposed for the superset-
    * guarantee property test. Nulls are excluded (an item column is
    * expected non-null; null can never be a reportable hitter). */
  def candidates(df: DataFrame, itemCol: String, capacity: Int): Seq[String] = {
    val sketch = udaf(new MisraGries(capacity), Encoders.STRING)
    df.filter(col(itemCol).isNotNull)
      .agg(sketch(col(itemCol)).as("cand"))
      .head().getSeq[String](0)
  }

  /** Items with frequency STRICTLY above n/k (n = non-null item
    * count), with their exact counts: `(item, freq)`. Exactly the
    * naive `groupBy.count.filter` answer, computed with bounded
    * exchanges (see object doc). `capacity` must be ≥ k for the
    * superset guarantee; the default 4k slack just shrinks the
    * phase-2 candidate list's false-positive tail. The threshold is
    * compared in exact integer form (freq·k > n) — no double
    * division to disagree with an oracle over. */
  def exact(df: DataFrame, itemCol: String, k: Int,
            capacity: Int = 0): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    val cap = if (capacity > 0) capacity else 4 * k
    require(cap >= k, s"capacity $cap must be >= k=$k for the superset guarantee")
    val items = df.filter(col(itemCol).isNotNull)
    val sketch = udaf(new MisraGries(cap), Encoders.STRING)
    // one pass for n + candidates; both are driver scalars bounded by
    // construction (a count and ≤ capacity strings)
    val head = items.agg(count(lit(1)).as("n"), sketch(col(itemCol)).as("cand")).head()
    val n = head.getLong(0)
    val cand = head.getSeq[String](1)
    // candidates as a broadcast relation, not inlined literals: the
    // plan stays constant-size for caller-supplied capacities (spec
    // pins capacity 10⁵), and the semi-join is the same map-side drop
    val candDf = df.sparkSession
      .createDataset(cand)(Encoders.STRING).toDF(itemCol)
    items.join(broadcast(candDf), Seq(itemCol), "left_semi")
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("freq"))
      .filter(col("freq") * k > n)
  }
}
