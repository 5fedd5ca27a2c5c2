package graft.operators

import graft.semantic.{QueryNer, SemanticSuite, UserProfile}
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField, StructType}

/** The flagship query: multi-stage retrieval with progressive filter
  * relaxation, priority dedup, hybrid rerank, top-N
  * (/root/reference/main.py:329-411 — SURVEY.md §3.1).
  *
  * The cascade is deliberately DRIVER-SIDE adaptive control flow over
  * small per-stage DataFrame plans (SURVEY.md §4): each stage is a
  * filter ∘ distance ∘ top-k plan (no corpus shuffle — top-k is
  * `TakeOrderedAndProject`), and each stage's ≤k result rows are
  * MATERIALIZED to the driver exactly once — the corpus is scanned
  * once per stage, never re-scanned for gating counts or the final
  * union (gating and keep-first dedup run over the collected ≤~100
  * rows in driver memory). The expensive side (the corpus scan) is
  * Catalyst's; only the orchestration is imperative — the same split
  * the reference reaches by accident, made explicit as policy.
  *
  * Both reference compositions (main.py strict-first and
  * main_remind.py scan-then-filter — SURVEY.md §3.4) are expressible
  * by configuring the stage list.
  */
final case class CascadeConfig(
    topK: Int = 10,
    relaxThreshold: Int = 5,
    fallbackThreshold: Int = 15,
    fallbackK: Int = 15,
    finalN: Int = 5,
    wJudge: Double = 0.7,
    wRule: Double = 0.3)

final class MultiStageSearch(
    corpus: DataFrame, idCol: String, textCol: String, embCol: String,
    cfg: CascadeConfig = CascadeConfig(),
    profile: UserProfile = UserProfile.empty,
    // Pluggable candidate source for the per-stage kNN (stage pred,
    // query vector, k) → (idCol, textCol, dist). Default: exact scan
    // over `corpus`. A served deployment passes an ANN-index reader
    // here (c5: IVF-probed partitions of the stored index) — the
    // cascade POLICY (stage list, gates, dedup, rerank) is identical
    // either way, which is exactly what c5's identity gate pins.
    knnBackend: Option[(Option[Column], Column, Int) => DataFrame] = None) {

  private val (queryNer, synonyms, _) = SemanticSuite.default

  /** L2 + profile coalesce (main.py:430-449): query NER first, then
    * any missing field backfills from the caller's profile. */
  private def resolvedNer(queryText: String): QueryNer =
    queryNer(queryText).withDefaults(profile)

  /** F4 empty-query guard (main.py:419-426): does this query short-
    * circuit to the typed empty response? The reference strips and
    * tests BEFORE NER/profile coalesce — a blank message is empty even
    * for a fully-populated profile. */
  private def isBlank(queryText: String): Boolean =
    queryText == null || queryText.trim.isEmpty

  /** The typed empty response: the exact result schema every search
    * method returns, zero rows, built as a LOCAL empty relation — the
    * plan does not reference the corpus, so NO stage (not even a scan)
    * can execute downstream of the guard. */
  private def emptyResponse: DataFrame = {
    val spark = corpus.sparkSession
    val schema = StructType(Seq(
      corpus.schema(idCol), corpus.schema(textCol),
      StructField("dist", DoubleType, nullable = true),
      StructField("stage_rank", IntegerType, nullable = false),
      StructField("judge_score", DoubleType, nullable = true),
      StructField("rule_score", DoubleType, nullable = true),
      StructField("score", DoubleType, nullable = true),
      StructField("rank", IntegerType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
  }

  /** L1 double, columnar: deterministic rule-NER over the doc text —
    * first vocabulary hit per field (job/region). */
  private def docNer(text: Column): (Column, Column) = {
    def firstHit(vocab: Set[String]) =
      regexp_extract(lower(text), "\\b(" + vocab.toSeq.sorted.mkString("|") + ")\\b", 1)
    (firstHit(SemanticSuite.CorpusVocab), firstHit(SemanticSuite.RegionVocab))
  }

  /** L4 double, columnar: deterministic judge — 0..5 by fraction of
    * condition tokens contained in the doc text. */
  private def judgeScore(text: Column, condToks: Seq[String]): Column =
    if (condToks.isEmpty) lit(0.0)
    else {
      val hits = condToks.map(t => when(lower(text).contains(t), 1).otherwise(0))
        .reduce(_ + _)
      round(lit(5.0) * hits / condToks.length, 0).cast("double")
    }

  private def knnStage(pred: Option[Column], queryVec: Column, k: Int,
                       stage: Int): DataFrame = {
    val hits = knnBackend match {
      case Some(backend) => backend(pred, queryVec, k)
      case None =>
        Knn.exact(pred.fold(corpus)(corpus.filter), embCol, idCol, queryVec, k)
    }
    hits.withColumn("stage_rank", lit(stage))
  }

  /** Run the cascade. `queryVec` is the embedded query (the embedding
    * model is an external boundary — SURVEY.md §2.1 S5). */
  def search(queryText: String, queryVec: Column): DataFrame = {
    if (isBlank(queryText)) return emptyResponse
    val ner: QueryNer = resolvedNer(queryText)
    val region = ner.region
    val job = ner.job

    def contains(term: String): Column =
      lower(col(textCol)).contains(term.toLowerCase)

    // Each stage collects its ≤k candidate rows (id, text, dist, stage)
    // to the driver ONCE; the embedding column is pruned before collect
    // so only a few KB move. Keep-first dedup (A1: first stage wins,
    // then ascending distance — /root/reference/main.py:173-181) and
    // the gating counts run over this driver-side list for free.
    var collected = Vector.empty[Row]
    var rowSchema: StructType = null
    var nextStage = 1
    def addStage(pred: Option[Column], k: Int): Unit = {
      val df = knnStage(pred, queryVec, k, nextStage)
        .select(col(idCol), col(textCol), col("dist"), col("stage_rank"))
      if (rowSchema == null) rowSchema = df.schema
      collected ++= df.collect()
      nextStage += 1
    }
    def accumulatedRows(): Seq[Row] = {
      val seen = scala.collection.mutable.HashSet.empty[Any]
      collected
        .sortBy(r => (r.getInt(3), r.getDouble(2)))
        .filter(r => seen.add(r.get(0)))
    }
    def count(): Long = accumulatedRows().size.toLong

    // S1 strict AND (main.py:341-347)
    (region, job) match {
      case (Some(r), Some(j)) => addStage(Some(contains(r) && contains(j)), cfg.topK)
      case (Some(r), None)    => addStage(Some(contains(r)), cfg.topK)
      case (None, Some(j))    => addStage(Some(contains(j)), cfg.topK)
      case _                  => addStage(None, cfg.topK)
    }
    // S2 OR relaxation (main.py:351-360)
    if (count() < cfg.relaxThreshold && region.isDefined && job.isDefined)
      addStage(Some(contains(region.get) || contains(job.get)), cfg.topK)
    // S3 single-field passes (main.py:363-383)
    if (count() < cfg.relaxThreshold) {
      region.foreach(r => addStage(Some(contains(r)), cfg.topK))
      job.foreach(j => addStage(Some(contains(j)), cfg.topK))
    }
    // S4 synonym expansion (main.py:386-397)
    job.foreach { j =>
      synonyms(j).foreach { syn =>
        val p = region.map(r => contains(r) && contains(syn)).getOrElse(contains(syn))
        addStage(Some(p), cfg.topK)
      }
    }
    // S5 unfiltered fallback (main.py:400-407)
    if (count() < cfg.fallbackThreshold) addStage(None, cfg.fallbackK)

    // dedup → hybrid rerank → top-N → rank (main.py:410,455-469)
    val spark = corpus.sparkSession
    val acc = spark.createDataFrame(
      spark.sparkContext.parallelize(accumulatedRows(), 1), rowSchema)
    rerankTail(acc, ner)
  }

  /** Shared rerank tail (main.py:410,455-469): deterministic judge +
    * NER-overlap rule score, weighted combine, top-N, rank. The rank
    * window is global but runs over ≤finalN rows (post-limit), so the
    * single-partition sort is a handful of rows, not a scale concern. */
  private def rerankTail(acc: DataFrame, ner: QueryNer): DataFrame = {
    val condToks = (ner.job.toSeq ++ ner.region.toSeq).map(_.toLowerCase).distinct
    val (dJob, dRegion) = docNer(col(textCol))
    val ranked = acc
      .withColumn("judge_score", judgeScore(col(textCol), condToks))
      .withColumn("rule_score", Rerank.nerOverlap(Seq(
        (ner.job.map(lit).getOrElse(lit("")), dJob),
        (ner.region.map(lit).getOrElse(lit("")), dRegion),
        (ner.ageGroup.map(lit).getOrElse(lit("")), lit("")))))
      .withColumn("score",
        Rerank.combined(col("judge_score"), col("rule_score"), cfg.wJudge, cfg.wRule))
      .orderBy(desc("score"), asc("dist"), asc(idCol))
      .limit(cfg.finalN)
    ranked.withColumn("rank",
      row_number().over(Window.partitionBy(lit(0))
        .orderBy(desc("score"), asc("dist"), asc(idCol))))
  }

  /** Fixed-policy cascade: the SAME stage list as [[search]] but with
    * count gating disabled — every stage always runs — which makes the
    * whole flagship composition ONE declarative Catalyst plan
    * (union-all of per-stage top-k → keep-first window dedup → rerank
    * → top-N + rank) with no driver-side collect at all. This is the
    * oracle-checkable twin of the adaptive cascade: identical
    * union/dedup/rerank/rank semantics (main.py:329-411), minus the
    * adaptivity that SQL cannot express.
    *
    * Scale shape: each stage is an independent filter ∘ distance ∘
    * TakeOrderedAndProject over the corpus (no corpus shuffle); the
    * union carries ≤ Σk rows, so dedup + rerank are driver-scale
    * relational ops on a tiny relation. */
  def searchFixed(queryText: String, queryVec: Column): DataFrame = {
    if (isBlank(queryText)) return emptyResponse
    val ner = resolvedNer(queryText)
    val region = ner.region
    val job = ner.job
    def contains(term: String): Column =
      lower(col(textCol)).contains(term.toLowerCase)

    // S1 strict AND (or best available single field)
    val s1: (Option[Column], Int) = ((region, job) match {
      case (Some(r), Some(j)) => Some(contains(r) && contains(j))
      case (Some(r), None)    => Some(contains(r))
      case (None, Some(j))    => Some(contains(j))
      case _                  => None
    }) -> cfg.topK
    // S2 OR relaxation — always on (gating disabled)
    val s2 = (for { r <- region; j <- job } yield contains(r) || contains(j))
      .map(p => (Some(p): Option[Column]) -> cfg.topK)
    // S3 single-field passes, region then job (search()'s order)
    val s3 = region.map(r => (Some(contains(r)): Option[Column]) -> cfg.topK)
    val s4 = job.map(j => (Some(contains(j)): Option[Column]) -> cfg.topK)
    // S4 synonym expansion
    val syn = job.toSeq.flatMap { j =>
      synonyms(j).map { sy =>
        val p = region.map(r => contains(r) && contains(sy)).getOrElse(contains(sy))
        (Some(p): Option[Column]) -> cfg.topK
      }
    }
    // S5 unfiltered fallback — always on
    val s5 = (None: Option[Column]) -> cfg.fallbackK

    val stages = (Seq(s1) ++ s2.toSeq ++ s3.toSeq ++ s4.toSeq ++ syn :+ s5)
    val perStage = stages.zipWithIndex.map { case ((pred, k), i) =>
      knnStage(pred, queryVec, k, i + 1)
        .select(col(idCol), col(textCol), col("dist"), col("stage_rank"))
    }
    val unioned = perStage.reduce(_ unionByName _)
    val deduped = Dedup.keepFirst(unioned, Seq(idCol),
      Seq(col("stage_rank"), col("dist"), col(idCol)))
    rerankTail(deduped, ner)
  }

  /** [[search]] WITH its count gates, as one declarative plan — the
    * c4 single-gate idiom generalized to the flagship's full gate
    * ladder. The key observation making this expressible: a stage's
    * RESULT never depends on earlier stages (each is an independent
    * filter ∘ distance ∘ top-k over the corpus) — only a stage's
    * INCLUSION does, through the running distinct-id count. So every
    * stage plan is built unconditionally, each gate becomes a 1-row
    * count aggregate over the (bounded, ≤k-row) earlier stage frames,
    * and a gated stage keeps or drops ALL its rows by broadcast-
    * crossing that count in — `adaptive ≡ gated` on ANY corpus, which
    * is exactly the identity c1 pins (and the gated plan itself is
    * DuckDB-replayable: stage CTEs + gates as scalar-subquery
    * predicates — c7).
    *
    * Stage numbering is the one adaptivity left: [[search]] numbers
    * only the stages that RAN. Mirrored declaratively — each stage's
    * `stage_rank` is 1 + the number of included stages before it,
    * computed from the same broadcast gate flags (a skipped gate
    * contributes 0), so the output is row-identical to [[search]]'s
    * including the rank column.
    *
    * Scale shape: per-stage TakeOrderedAndProject keeps ≤k rows; each
    * stage frame is localCheckpointed (bounded ≤15 rows) because the
    * count ladder and the final union reference it up to 3× — one
    * corpus scan per stage, same as the adaptive form. The gate
    * aggregates and flag frame are 1-row broadcasts. */
  def searchGated(queryText: String, queryVec: Column): DataFrame = {
    if (isBlank(queryText)) return emptyResponse
    val ner = resolvedNer(queryText)
    val region = ner.region
    val job = ner.job
    def contains(term: String): Column =
      lower(col(textCol)).contains(term.toLowerCase)

    def stageFrame(pred: Option[Column], k: Int): DataFrame =
      knnStage(pred, queryVec, k, 0)
        .select(col(idCol), col(textCol), col("dist"))
        .localCheckpoint(false) // ≤k rows; reused by counts + union
    def distinctIds(dfs: Seq[DataFrame]): DataFrame =
      dfs.map(_.select(col(idCol))).reduce(_ unionByName _)
        .agg(count_distinct(col(idCol)).as("__n"))

    // S1 (always): strict AND, or the best available single field
    val st1 = stageFrame((region, job) match {
      case (Some(r), Some(j)) => Some(contains(r) && contains(j))
      case (Some(r), None)    => Some(contains(r))
      case (None, Some(j))    => Some(contains(j))
      case _                  => None
    }, cfg.topK)
    // gate g2 = |ids after S1| < relaxThreshold (S2 exists only when
    // both fields resolved — a STATIC fact of the query, not a gate)
    val n1 = distinctIds(Seq(st1))
    val st2 = (for { r <- region; j <- job } yield contains(r) || contains(j))
      .map(p => stageFrame(Some(p), cfg.topK)
        .crossJoin(broadcast(n1)).filter(col("__n") < cfg.relaxThreshold)
        .drop("__n"))
    // gate g3 = |ids after S1 ∪ gated S2| < relaxThreshold; it admits
    // BOTH single-field stages (search() checks the count once)
    val n2 = distinctIds(Seq(st1) ++ st2.toSeq)
    def g3(df: DataFrame) = df.crossJoin(broadcast(n2))
      .filter(col("__n") < cfg.relaxThreshold).drop("__n")
    val st3 = region.map(r => g3(stageFrame(Some(contains(r)), cfg.topK)))
    val st4 = job.map(j => g3(stageFrame(Some(contains(j)), cfg.topK)))
    // synonym stages: ungated
    val syn = job.toSeq.flatMap { j =>
      synonyms(j).map { sy =>
        val p = region.map(r => contains(r) && contains(sy))
          .getOrElse(contains(sy))
        stageFrame(Some(p), cfg.topK)
      }
    }
    // gate g5 = |ids after everything included so far| < fallbackThreshold
    val n6 = distinctIds(Seq(st1) ++ st2.toSeq ++ st3.toSeq ++ st4.toSeq ++ syn)
    val st7 = stageFrame(None, cfg.fallbackK)
      .crossJoin(broadcast(n6)).filter(col("__n") < cfg.fallbackThreshold)
      .drop("__n")

    // dynamic stage ranks from one broadcast 1-row flag frame: a
    // stage's rank = 1 + included stages before it
    val gflags = broadcast(
      n1.select((col("__n") < cfg.relaxThreshold).as("__g2"))
        .crossJoin(n2.select((col("__n") < cfg.relaxThreshold).as("__g3")))
        .crossJoin(n6.select((col("__n") < cfg.fallbackThreshold).as("__g5"))))
    val s2exists = st2.isDefined
    val nSingle = st3.size + st4.size
    val g2i: Column =
      if (s2exists) when(col("__g2"), 1).otherwise(0) else lit(0)
    val g3i: Column =
      if (nSingle > 0) when(col("__g3"), nSingle).otherwise(0) else lit(0)
    // Only stages whose rank actually reads a gate indicator pay the
    // gflags crossJoin — st1/st2 (and st3+ when the relevant gates
    // collapse to lit(0)) carry pure-literal ranks and join nothing.
    // A rank reads gflags exactly when one of its indicator terms is
    // non-literal: g2i when st2 exists, g3i when any single-term stage
    // exists — decided here statically (the ranks are built right
    // below) rather than by introspecting the Column's expression.
    val g2Reads = s2exists
    val g3Reads = nSingle > 0
    def at(df: DataFrame, rank: Column, readsGate: Boolean): DataFrame = {
      val base = if (readsGate) df.crossJoin(gflags) else df
      base.withColumn("stage_rank", rank.cast("int"))
        .select(col(idCol), col(textCol), col("dist"), col("stage_rank"))
    }
    val parts =
      Seq(at(st1, lit(1), readsGate = false)) ++
        st2.map(at(_, lit(2), readsGate = false)).toSeq ++
        st3.map(at(_, lit(2) + g2i, g2Reads)).toSeq ++
        st4.map(at(_, lit(2) + g2i + lit(st3.size), g2Reads)).toSeq ++
        syn.zipWithIndex.map { case (df, m) =>
          at(df, lit(2 + m) + g2i + g3i, g2Reads || g3Reads)
        } ++
        Seq(at(st7, lit(2 + syn.size) + g2i + g3i, g2Reads || g3Reads))
    val unioned = parts.reduce(_ unionByName _)
    val deduped = Dedup.keepFirst(unioned, Seq(idCol),
      Seq(col("stage_rank"), col("dist"), col(idCol)))
    rerankTail(deduped, ner)
  }

  /** The main_remind.py composition (SURVEY.md §3.4): stage 0 scans a
    * large candidate pool (k≈corpus) and POST-filters on the parsed
    * NER metadata (F3/F2 — /root/reference/main_remind.py:409-474),
    * falling back to the unfiltered pool when fewer than
    * `relaxThreshold` survive; then the same rerank tail. Same
    * operators as [[search]], different composition — configurable
    * policy, not a hard-coded pipeline. */
  def searchRemind(queryText: String, queryVec: Column,
                   scanK: Int = 1000): DataFrame = {
    if (isBlank(queryText)) return emptyResponse
    val ner = resolvedNer(queryText)
    def contains(term: String): Column =
      lower(col(textCol)).contains(term.toLowerCase)

    val pool = Knn.exact(corpus, embCol, idCol, queryVec, scanK)
      .select(col(idCol), col(textCol), col("dist"))
    val poolRows = pool.collect()

    // F2/F3 post-filter on the scanned pool, driver-side over ≤scanK rows
    val textIdx = 1
    def keep(r: Row): Boolean = {
      // null text = non-matching (the columnar path tolerates nulls too)
      if (r.isNullAt(textIdx)) return false
      val t = r.getString(textIdx).toLowerCase
      ner.job.forall(j => t.contains(j.toLowerCase)) &&
        ner.region.forall(rg => t.contains(rg.toLowerCase))
    }
    val filtered = poolRows.filter(keep)
    val kept = if (filtered.length >= cfg.relaxThreshold) filtered else poolRows

    val spark = corpus.sparkSession
    val schema = StructType(pool.schema.fields :+
      org.apache.spark.sql.types.StructField("stage_rank",
        org.apache.spark.sql.types.IntegerType, nullable = false))
    val tagged = kept.map(r => Row.fromSeq(r.toSeq :+ 1))
    val acc = spark.createDataFrame(
      spark.sparkContext.parallelize(tagged.toIndexedSeq, 1), schema)

    rerankTail(acc, ner)
  }

  /** [[searchRemind]] WITH its adaptive gate, as one declarative plan.
    *
    * The remind composition has exactly ONE gate (fewer than
    * `relaxThreshold` post-filter survivors ⇒ fall back to the
    * unfiltered pool), and a single count-gate over a single pool IS
    * relationally expressible: flag matching pool rows, aggregate the
    * flag count (1 row), broadcast it back over the pool, and keep
    * `match=1 OR count<threshold`. No driver-side collect, and —
    * unlike [[searchFixed]] — the ADAPTIVITY itself sits inside the
    * oracle-checked plan (the multi-stage cascade's sequential gates
    * stay driver-side: each later stage's existence depends on the
    * previous counts, which SQL cannot express without recursion).
    *
    * Scale shape: the pool is one filter ∘ distance ∘
    * TakeOrderedAndProject (≤scanK rows); everything after operates on
    * that bounded relation; the count broadcast is 1 row. */
  def searchRemindFixed(queryText: String, queryVec: Column,
                        scanK: Int = 1000): DataFrame = {
    if (isBlank(queryText)) return emptyResponse
    val ner = resolvedNer(queryText)
    def contains(term: String): Column =
      lower(col(textCol)).contains(term.toLowerCase)
    val pool = Knn.exact(corpus, embCol, idCol, queryVec, scanK)
      .select(col(idCol), col(textCol), col("dist"))
    // keep(r): null text never matches; absent NER fields don't filter
    val pred = col(textCol).isNotNull &&
      ner.job.map(contains).getOrElse(lit(true)) &&
      ner.region.map(contains).getOrElse(lit(true))
    val flagged = pool.withColumn("__match", when(pred, 1).otherwise(0))
    val cnt = flagged.agg(sum("__match").as("__n"))
    val kept = flagged.crossJoin(broadcast(cnt))
      .filter(col("__match") === 1 || col("__n") < cfg.relaxThreshold)
      .withColumn("stage_rank", lit(1))
      .select(col(idCol), col(textCol), col("dist"), col("stage_rank"))
    rerankTail(kept, ner)
  }
}
