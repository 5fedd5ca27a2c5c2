package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Vector distance/similarity over `array<float>` embedding columns
  * (the reference's kNN space is L2 over Chroma/hnswlib —
  * /root/reference/main.py:158-164; SURVEY.md §1.3, §2.5).
  *
  * Composed from built-in higher-order functions so the SAME sequential
  * left-fold in double precision is reproducible by the DuckDB oracle
  * (`list_sum(list_transform(...))`) bit-for-bit. A fused native
  * Catalyst Expression ([[graft.plans.VectorExpressions]]) provides the
  * codegen'd fast path for the bench-critical operators; both paths
  * agree to the last ulp because they fold left in double.
  */
object VectorFunctions {

  private def asDouble(c: Column): Column = c.cast(ArrayType(DoubleType))

  /** Sum of element products, left-fold in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  /** Squared L2 distance, left-fold in double. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** L2 (Euclidean) distance — the reference's ranking metric. */
  def l2(a: Column, b: Column): Column = sqrt(l2Sq(a, b))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 for zero-norm vectors (never NaN/null). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0.0, lit(0.0)).otherwise(d / nn)
  }
}
