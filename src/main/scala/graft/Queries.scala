package graft

import graft.functions.{TextAnalysis, TextFunctions, VectorFunctions}
import graft.multimodal.{DecodeStub, Multimodal}
import graft.operators.{Ann, Bm25, Chunker, Curation, Dedup, HeavyHitters, Knn, LshAnn, Mmr, MultiStageSearch, Packing, QualityModel, Rerank, RetrievalEval}
import graft.sources.JobCorpus
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One entry per implemented operator (SURVEY.md §2 inventory + the
  * north-star LLM-pipeline operators). Every SQL-expressible query
  * carries an exact DuckDB oracle over the same parquet tables; the
  * oracle mirrors the Spark computation operation-for-operation
  * (same fold order, same rounding, same total tie-breaks) so hashes
  * match bit-for-bit (SURVEY.md §5).
  */
final case class QuerySpec(
    name: String,
    impl: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Queries
    extends QueriesShared
    with QueriesRelational with QueriesEvents with QueriesProjections
    with QueriesText with QueriesCuration with QueriesLexical
    with QueriesDedup with QueriesVector with QueriesAnn
    with QueriesMultimodal with QueriesCascade {

  /** Every named query, families concatenated in SURVEY order. The
    * per-family traits live in src/main/scala/graft/queries/. */
  val all: Seq[QuerySpec] =
    queriesRelational ++ queriesEvents ++ queriesProjections ++
      queriesText ++ queriesCuration ++ queriesLexical ++
      queriesDedup ++ queriesVector ++ queriesAnn ++
      queriesMultimodal ++ queriesCascade
}
