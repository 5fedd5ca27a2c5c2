package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregation (SURVEY.md §2.5 V2 batch kNN, 100 TB
  * shape).
  *
  * `Knn.batch`'s window form ranks with `row_number` over
  * (qid, dist) — the exchange carries EVERY (query × corpus) pair to
  * the rank sort. This Aggregator keeps a bounded buffer per query
  * instead: partial aggregation runs map-side, so the shuffle carries
  * at most k rows per (partition × query) — the same partial-combine
  * win partial sums get, applied to top-k. The result is
  * deterministic: ordered by (dist asc, id asc), ties never flip.
  *
  * Chosen over a custom SparkPlan/Strategy deliberately (SURVEY.md
  * §4): `Aggregator` is the public, Catalyst-planned surface for
  * exactly this — ObjectHashAggregate keeps the buffer as a live
  * object within a partition and serializes only at the exchange.
  */
object TopK {

  final case class Entry(dist: Double, id: Long)

  /** Unordered bounded buffer; pruned to k only when it exceeds 4k,
    * so per-row cost stays O(1) amortized. */
  final case class Buf(var entries: List[Entry])

  private def prune(entries: List[Entry], k: Int): List[Entry] =
    entries.sortBy(e => (e.dist, e.id)).take(k)

  final class TopKAggregator(k: Int) extends Aggregator[Entry, Buf, Seq[Entry]] {
    require(k > 0)
    override def zero: Buf = Buf(Nil)
    override def reduce(b: Buf, e: Entry): Buf = {
      b.entries = e :: b.entries
      if (b.entries.length > 4 * k) b.entries = prune(b.entries, k)
      b
    }
    override def merge(a: Buf, b: Buf): Buf = {
      a.entries = prune(a.entries ::: b.entries, k)
      a
    }
    override def finish(b: Buf): Seq[Entry] = prune(b.entries, k)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }

  /** Column form: `topK(k)(distCol, idCol)` → array<struct<dist,id>>
    * sorted ascending. Use inside `groupBy(qid).agg(...)` — the
    * product input encoder flattens [[Entry]] into two arguments. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAggregator(k), Encoders.product[Entry])
    (dist: Column, id: Column) => fn(dist, id)
  }
}
