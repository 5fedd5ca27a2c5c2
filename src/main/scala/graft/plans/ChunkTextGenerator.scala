package graft.plans

import graft.operators.Chunker
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** G1 as a Catalyst Generator (UDTF): `chunk_text(text, size, overlap)`
  * → rows of (chunk_index, chunk) — the SQL-callable form of
  * [[graft.operators.Chunker]] (SURVEY.md §4 custom work #1: "a
  * Generator only if we want it callable from SQL" — this is that
  * variant; the Dataset pipeline uses the Chunker directly).
  *
  * CodegenFallback is deliberate: a generator's cost is dominated by
  * the recursive split itself; the surrounding Generate/explode stays
  * in codegen.
  */
case class ChunkText(child: Expression, chunkSize: Int, overlap: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  @transient private lazy val chunker = Chunker(chunkSize, overlap)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"chunk_text requires a string input, got ${child.dataType.sql}")

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_index", IntegerType, nullable = false),
    StructField("chunk", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else chunker.split(t.toString).zipWithIndex.map { case (c, i) =>
      InternalRow(i, UTF8String.fromString(c))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ChunkText =
    copy(child = newChild)
}
