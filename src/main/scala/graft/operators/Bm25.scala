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
    // Internal per-term columns are indexed (__tf_0, __df_0, __score_0,
    // …) and only renamed to the reader-facing tf_<term>/df_<term>/
    // score_<term> names at the END via exact-match renames: resolving
    // a term-derived name with col() fails on '.' or '`' in a
    // whitespace token (same hazard as [[topKFromIndex]]'s pivot).
    val toks = df.withColumn("__toks", tokens(col(textCol)))
      .withColumn("dl", size(col("__toks")).cast("double"))
    val withTf = terms.zipWithIndex.foldLeft(toks) { case (d, (t, i)) =>
      d.withColumn(s"__tf_$i",
        size(filter(col("__toks"), w => w === t)).cast("double"))
    }
    // One global aggregate: corpus size, mean doc length, per-term df.
    // Broadcast back as a single row — the only non-narrow step.
    val statCols =
      Seq(count(lit(1)).cast("double").as("n_docs"), avg(col("dl")).as("avgdl")) ++
        terms.indices.map(i => sum(when(col(s"__tf_$i") > 0, 1L).otherwise(0L))
          .cast("double").as(s"__df_$i"))
    val stats = withTf.agg(statCols.head, statCols.tail: _*)
    val scored = terms.indices.foldLeft(withTf.crossJoin(broadcast(stats))) { (d, i) =>
      val tf = col(s"__tf_$i")
      val idf = log(lit(1.0) +
        (col("n_docs") - col(s"__df_$i") + 0.5) / (col(s"__df_$i") + 0.5))
      val norm = tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))
      d.withColumn(s"__score_$i",
        when(tf > 0, idf * tf * (k1 + 1.0) / norm).otherwise(lit(0.0)))
    }
    val renames = terms.zipWithIndex.flatMap { case (t, i) =>
      Seq(s"__tf_$i" -> s"tf_$t", s"__df_$i" -> s"df_$t",
        s"__score_$i" -> s"score_$t")
    }.toMap
    // fixed-order sum — never a reduce over an unordered set
    scored.withColumn("bm25",
        terms.indices.map(i => col(s"__score_$i")).reduceLeft(_ + _))
      .withColumnsRenamed(renames)
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

  /** Inverted-index build: one row per term with document frequency,
    * collection frequency, and the doc_id-sorted posting list — the
    * artifact that amortizes [[topK]]'s two corpus scans into a
    * build-once/serve-many index (write it partitionBy a term hash
    * bucket and a query reads |query terms| posting rows, not the
    * corpus). Plan: explode → (term, doc) partial-aggregated tf →
    * per-term collect_list; both exchanges carry (term, id, count)
    * scalars. collect_list order is nondeterministic, so the list is
    * array_sort-ed (struct order = doc_id first) for a reproducible
    * artifact. Per-term memory is the posting list — the explicit
    * trade of posting-list indexes; a stopword-scale term should be
    * dropped by a df cap upstream (see Curation.duplicateSpans'
    * maxGramDf for the same guard). */
  /** `spread = true` inserts one doc_id hash exchange BELOW the
    * tokenize (round 22; the shinglePipeline rationale): a single-file
    * corpus scans as ONE partition, so the explode+aggregate pipeline
    * above it ran single-task (profiled on i3/i4 as serial 250-450 ms
    * stages). The exchange moves raw documents once — narrower than
    * the exploded term rows — and parallelizes every downstream stage.
    * Callers building a SMALL delta (the incremental upsert path) pass
    * false: spreading a few hundred rows over the cluster is pure
    * exchange overhead (measured: i2 1.24→1.55 s with the delta
    * spread). */
  def buildPostings(df: DataFrame, idCol: String, textCol: String,
                    spread: Boolean = true): DataFrame = {
    val src0 = df.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("__text"))
    val src =
      if (spread) src0.repartition(
        df.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
      else src0
    src
      .select(col("doc_id"), explode(tokens(col("__text"))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("cf"),
        array_sort(collect_list(struct(col("doc_id"), col("tf"))))
          .as("postings"))
  }

  /** BM25 top-k SERVED FROM the inverted index (same scores as
    * [[topK]], bit-for-bit): only the query terms' posting rows are
    * read — against an index stored partitionBy(term bucket) the scan
    * prunes to those partitions — joined back to the doc-length table
    * on doc_id. Per-term contributions are pivoted into fixed-order
    * columns before the final sum, so the double addition order
    * matches [[score]] and the shared DuckDB oracle exactly. */
  def topKFromIndex(postings: DataFrame, doclen: DataFrame, idCol: String,
                    terms: Seq[String], k: Int,
                    k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms, "terms must be distinct, non-empty")
    val qp = postings.filter(col("term").isin(terms: _*))
      .select(col("term"), col("df").cast("double").as("__df"),
        explode(col("postings")).as("__p"))
      .select(col("term"), col("__df"),
        col("__p.doc_id").as(idCol), col("__p.tf").cast("double").as("__tf"))
    val stats = doclen.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val scored = qp.join(doclen, Seq(idCol)).crossJoin(broadcast(stats))
      .withColumn("__score",
        log(lit(1.0) + (col("n_docs") - col("__df") + 0.5) / (col("__df") + 0.5)) *
          col("__tf") * (k1 + 1.0) /
          (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
    // ≤1 row per (doc, term), so each pivoted sum is exact (no
    // re-association); the cross-term sum is then a fixed-order fold.
    // Internal score columns are indexed POSITIONALLY (__s_0, __s_1,
    // …): a term-derived name would round-trip user text through
    // col()-resolution, where a '.' or '`' in a whitespace token fails
    // with an AnalysisException. The tf_<term> output columns are only
    // ever CREATED via .as() (never re-resolved), so they keep the
    // reader-friendly term names.
    val aggCols =
      terms.map(t => coalesce(sum(when(col("term") === t, col("__tf"))), lit(0.0)).as(s"tf_$t")) ++
        terms.zipWithIndex.map { case (t, i) =>
          coalesce(sum(when(col("term") === t, col("__score"))), lit(0.0)).as(s"__s_$i") }
    val per = scored.groupBy(col(idCol)).agg(aggCols.head, aggCols.tail: _*)
    per.withColumn("bm25", terms.indices.map(i => col(s"__s_$i")).reduceLeft(_ + _))
      .drop(terms.indices.map(i => s"__s_$i"): _*)
      .filter(col("bm25") > 0)
      .orderBy(desc("bm25"), col(idCol))
      .limit(k)
  }

  /** Incremental posting-index upsert: merge a NEW batch of documents
    * into a stored [[buildPostings]] artifact without rebuilding —
    * the lexical twin of the d15/d17 incremental containment path.
    * Contract: batch doc ids must be NEW (not already in the stored
    * index); an id present on both sides would double-count df/cf and
    * duplicate its posting entry (same append-only contract as every
    * log-structured posting merge).
    *
    * Plan shape: only the batch's terms shuffle — the batch builds its
    * own (term, df, cf, postings) delta (batch-sized), joins the
    * stored index on term (delta-term rows only), and merged posting
    * lists re-sort per term; every term NOT in the batch passes
    * through untouched via a left-anti join. Against a term-bucket-
    * partitioned store the rewrite touches only the delta's buckets
    * (the d12 stored-band-index pattern). At 100 TB the cost is
    * bounded by the batch + the affected posting rows, never the
    * corpus. */
  def upsertPostings(stored: DataFrame, batch: DataFrame,
                     idCol: String, textCol: String): DataFrame = {
    // spread=false: the batch is the incremental DELTA — typically a
    // small fraction of the corpus — and spreading it costs more than
    // the parallelism buys (see buildPostings' scaladoc).
    val delta = buildPostings(batch, idCol, textCol, spread = false)
      .select(col("term"), col("df").as("__df_d"), col("cf").as("__cf_d"),
        col("postings").as("__post_d"))
    val untouched = stored.join(delta.select("term"), Seq("term"), "left_anti")
    val merged = stored.join(delta, Seq("term"), "right")
      .select(col("term"),
        (coalesce(col("df"), lit(0L)) + col("__df_d")).as("df"),
        (coalesce(col("cf"), lit(0L)) + col("__cf_d")).as("cf"),
        array_sort(concat(
          coalesce(col("postings"),
            array().cast("array<struct<doc_id:bigint,tf:bigint>>")),
          col("__post_d"))).as("postings"))
    untouched.unionByName(merged)
  }

  /** Delete documents from a stored posting index without a rebuild —
    * the lexical twin of the vector index's tombstone compaction
    * ([[graft.sources.IndexStore.compactPartitioned]]). The deleted
    * docs' TEXT identifies the affected terms (a purge manifest in a
    * curation pipeline carries the doc, so this costs nothing extra;
    * without text, finding a doc's terms would mean scanning every
    * posting list). Plan shape: the broadcast-small (term, doc_id)
    * delete-pair table semi-joins the affected stored rows out,
    * their posting lists explode → anti-join drops deleted entries →
    * one term-keyed regroup rebuilds list + df + cf; untouched terms
    * pass a broadcast left-anti join unread. Cost ∝ affected posting
    * rows, never the index. A term whose postings empty out drops
    * from the index entirely (no zero-df debris), so the result is
    * IDENTICAL to a from-scratch build over the live docs. */
  def deletePostings(stored: DataFrame, deletedDocs: DataFrame,
                     idCol: String, textCol: String): DataFrame = {
    val dpairs = deletedDocs
      .select(col(idCol).cast("long").as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .distinct()
    val dtermList = dpairs.select("term").distinct()
    val untouched = stored.join(broadcast(dtermList), Seq("term"), "left_anti")
    val rewritten = stored.join(broadcast(dtermList), Seq("term"), "left_semi")
      .select(col("term"), explode(col("postings")).as("__p"))
      .select(col("term"), col("__p.doc_id").as("doc_id"),
        col("__p.tf").as("tf"))
      .join(broadcast(dpairs), Seq("term", "doc_id"), "left_anti")
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("cf"),
        array_sort(collect_list(struct(col("doc_id"), col("tf"))))
          .as("postings"))
    untouched.unionByName(rewritten)
  }

  /** Per-document token-length table (doc_id, dl) — the side table a
    * posting-list index pairs with for BM25 length normalization. */
  def docLengths(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as(idCol),
      size(tokens(col(textCol))).cast("double").as("dl"))

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
