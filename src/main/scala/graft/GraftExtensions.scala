package graft

import graft.plans.{ChunkText, VectorCosine, VectorDot, VectorL2Sq}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Sqrt}

/** SQL surface for the native vector kernels.
  *
  * Two registration paths share one builder table:
  *  - cluster-wide: `--conf spark.sql.extensions=graft.GraftExtensions`
  *    (the standard SparkSessionExtensions hook);
  *  - per-session: `GraftExtensions.register(spark)` on any live
  *    session (test/notebook convenience).
  *
  * After either, `spark.sql("SELECT vector_l2(a, b) ...")` plans the
  * same codegen'd expressions the DataFrame API uses.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  private def binary(f: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = { args =>
    require(args.length == 2, "expected exactly 2 arguments")
    f(args(0), args(1))
  }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("vector_dot", info("vector_dot", "_FUNC_(a, b) - dot product of two float/double arrays"),
      binary(VectorDot.apply)),
    ("vector_l2sq", info("vector_l2sq", "_FUNC_(a, b) - squared L2 distance"),
      binary(VectorL2Sq.apply)),
    ("vector_l2", info("vector_l2", "_FUNC_(a, b) - L2 (Euclidean) distance"),
      binary((a, b) => Sqrt(VectorL2Sq(a, b)))),
    ("vector_cosine", info("vector_cosine", "_FUNC_(a, b) - cosine similarity (0 for zero norm)"),
      binary(VectorCosine.apply)),
    ("chunk_text", info("chunk_text",
      "_FUNC_(text, size, overlap) - recursive-separator chunking to (chunk_index, chunk) rows"),
      { args =>
        require(args.length == 3, "expected chunk_text(text, size, overlap)")
        def intLit(e: Expression, what: String): Int = e.eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"chunk_text $what must be an integer literal, got $other")
        }
        ChunkText(args(0), intLit(args(1), "size"), intLit(args(2), "overlap"))
      }))

  /** Register on a live session (same builders as the extensions). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), inf, builder)
    }
}
