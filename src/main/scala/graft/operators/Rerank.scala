package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hybrid rerank scoring (SURVEY.md §2.5 V4, §2.6 A9/A10).
  *
  * The reference combines an LLM-judge score with a rule-based
  * NER-overlap score: `0.7·llm + 0.3·manual`
  * (/root/reference/main.py:298-311), where the manual score gives +1
  * per NER field whose user/doc values substring-contain each other in
  * either direction (/root/reference/main.py:225-234), and missing
  * judge scores pad to 0 (/root/reference/main.py:319-321).
  */
object Rerank {

  /** V4: bidirectional-contains overlap on one field pair; null/empty
    * on either side contributes 0 (the reference's falsy guard). */
  def fieldOverlap(user: Column, doc: Column): Column = {
    val u = lower(trim(coalesce(user, lit(""))))
    val d = lower(trim(coalesce(doc, lit(""))))
    when(length(u) > 0 && length(d) > 0 && (d.contains(u) || u.contains(d)), 1)
      .otherwise(0)
  }

  /** V4: total overlap score over (user, doc) field pairs — the
    * reference scores 직무/근무지역/연령대 (3 pairs). */
  def nerOverlap(pairs: Seq[(Column, Column)]): Column =
    pairs.map { case (u, d) => fieldOverlap(u, d) }
      .reduce(_ + _).cast("double")

  /** A9 + A10: weighted combine with null-padding of the judge score. */
  def combined(llmScore: Column, ruleScore: Column,
               wLlm: Double = 0.7, wRule: Double = 0.3): Column =
    lit(wLlm) * coalesce(llmScore, lit(0.0)) + lit(wRule) * coalesce(ruleScore, lit(0.0))
}
