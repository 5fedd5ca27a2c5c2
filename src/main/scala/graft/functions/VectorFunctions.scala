package graft.functions

import graft.plans.{VectorCosine, VectorDot, VectorL2Sq}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Vector distance/similarity over `array<float>` embedding columns
  * (the reference's kNN space is L2 over Chroma/hnswlib —
  * /root/reference/main.py:158-164; SURVEY.md §1.3, §2.5).
  *
  * Public entry points dispatch to the fused native Catalyst
  * expressions in [[graft.plans]] — codegen'd tight loops over raw
  * ArrayData, the bench-critical path. The composed higher-order-
  * function forms are kept as `*Hof` because they are the DuckDB-
  * mirrorable specification: both paths fold left in double and agree
  * bit-for-bit (asserted by VectorExpressionsSpec).
  */
object VectorFunctions {

  private def native(f: (org.apache.spark.sql.catalyst.expressions.Expression,
                         org.apache.spark.sql.catalyst.expressions.Expression) =>
                        org.apache.spark.sql.catalyst.expressions.Expression)
                    (a: Column, b: Column): Column =
    ColumnBridge.column(f(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Sum of element products, left-fold in double (native fast path). */
  def dot(a: Column, b: Column): Column = native(VectorDot.apply)(a, b)

  /** Squared L2 distance, left-fold in double (native fast path). */
  def l2Sq(a: Column, b: Column): Column = native(VectorL2Sq.apply)(a, b)

  /** L2 (Euclidean) distance — the reference's ranking metric. */
  def l2(a: Column, b: Column): Column = sqrt(l2Sq(a, b))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 for zero-norm vectors (never NaN/null).
    * Single fused pass over both arrays. */
  def cosine(a: Column, b: Column): Column = native(VectorCosine.apply)(a, b)

  // ---- HOF specification forms (DuckDB-mirrorable; slow path) ----

  private def asDouble(c: Column): Column = c.cast(ArrayType(DoubleType))

  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def l2SqHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  def l2Hof(a: Column, b: Column): Column = sqrt(l2SqHof(a, b))

  def cosineHof(a: Column, b: Column): Column = {
    val d = dotHof(a, b)
    val nn = sqrt(dotHof(a, a)) * sqrt(dotHof(b, b))
    when(nn === 0.0, lit(0.0)).otherwise(d / nn)
  }
}
