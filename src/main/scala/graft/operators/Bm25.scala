package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 lexical ranking + reciprocal-rank fusion — the lexical half of
  * hybrid retrieval (the reference is vector-only; production search
  * over the same corpus pairs the ANN stage with a term index and
  * fuses, e.g. Elastic/Vespa-style).
  *
  * For a FIXED query (the serving shape: one query, huge corpus) the
  * whole computation is two narrow passes over the corpus plus one
  * scalar broadcast: per-doc term frequencies are HOF expressions (no
  * explode, no term shuffle), the corpus-level stats (N, avgdl, per-
  * term df) are ONE global aggregate broadcast back, and the top-k is
  * TakeOrderedAndProject. Nothing shuffles the corpus — the same plan
  * at 100 TB moves k rows plus one stats row.
  *
  * Term summation order is FIXED (fold over the query terms in given
  * order), so scores are bit-reproducible against the DuckDB oracle.
  */
object Bm25 {

  private val Ws = "[ \t\n]+"

  private def tokens(textCol: Column): Column =
    filter(split(lower(trim(textCol)), Ws), w => length(w) > 0)

  /** Per-document BM25 scores for `terms` over `df[textCol]`, k1/b at
    * the standard Robertson defaults. Returns the input plus `dl` and
    * one `tf_<term>`/`score_<term>` pair per query term and the total
    * `bm25`. Use [[topK]] for the serving form. */
  def score(df: DataFrame, textCol: String, terms: Seq[String],
            k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms, "terms must be distinct, non-empty")
    val toks = df.withColumn("__toks", tokens(col(textCol)))
      .withColumn("dl", size(col("__toks")).cast("double"))
    val withTf = terms.foldLeft(toks) { (d, t) =>
      d.withColumn(s"tf_$t",
        size(filter(col("__toks"), w => w === t)).cast("double"))
    }
    // One global aggregate: corpus size, mean doc length, per-term df.
    // Broadcast back as a single row — the only non-narrow step.
    val statCols =
      Seq(count(lit(1)).cast("double").as("n_docs"), avg(col("dl")).as("avgdl")) ++
        terms.map(t => sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L))
          .cast("double").as(s"df_$t"))
    val stats = withTf.agg(statCols.head, statCols.tail: _*)
    val scored = terms.foldLeft(withTf.crossJoin(broadcast(stats))) { (d, t) =>
      val tf = col(s"tf_$t")
      val idf = log(lit(1.0) +
        (col("n_docs") - col(s"df_$t") + 0.5) / (col(s"df_$t") + 0.5))
      val norm = tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))
      d.withColumn(s"score_$t",
        when(tf > 0, idf * tf * (k1 + 1.0) / norm).otherwise(lit(0.0)))
    }
    // fixed-order sum — never a reduce over an unordered set
    scored.withColumn("bm25",
      terms.map(t => col(s"score_$t")).reduceLeft(_ + _))
      .drop("__toks")
  }

  /** Serving form: top-k docs by BM25 for one query, ties broken by id.
    * Plans as TakeOrderedAndProject over the scored scan. */
  def topK(df: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k: Int): DataFrame =
    score(df, textCol, terms)
      .filter(col("bm25") > 0)
      .orderBy(desc("bm25"), col(idCol))
      .limit(k)

  /** Reciprocal-rank fusion of two bounded candidate lists (the hybrid
    * tail: BM25 top-k × ANN top-k). Inputs carry (idCol, rank starting
    * at 1); a doc absent from one list contributes nothing for it —
    * the standard RRF treatment of unbounded tails. Both lists are
    * top-k-bounded BEFORE fusion, so the join is k×k-small regardless
    * of corpus size. */
  def rrf(a: DataFrame, b: DataFrame, idCol: String,
          rankCol: String = "rank", c: Double = 60.0): DataFrame = {
    val left = a.select(col(idCol), col(rankCol).as("__ra"))
    val right = b.select(col(idCol), col(rankCol).as("__rb"))
    left.join(right, Seq(idCol), "full_outer")
      .select(col(idCol),
        (coalesce(lit(1.0) / (lit(c) + col("__ra")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("__rb")), lit(0.0))).as("rrf_score"),
        col("__ra").as("rank_a"), col("__rb").as("rank_b"))
  }

  /** Rank a bounded (≤k-row) result by an explicit order — the lit
    * partition declares the single-partition window INTENTIONAL. */
  def rankBounded(df: DataFrame, order: Seq[Column]): DataFrame =
    df.withColumn("rank",
      row_number().over(Window.partitionBy(lit(0)).orderBy(order: _*)))
}
