package graft.operators

import graft.functions.VectorFunctions
import graft.semantic.{DictSynonyms, QueryNer, RuleQueryNer, SemanticSuite, UserProfile}
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
/** `semanticDriverBatchMax`: batch-cascade query logs at most this
  * large resolve NER/synonyms on the DRIVER (the reference's
  * per-request shape — one external call per query); larger logs
  * resolve them inside the cluster via `mapPartitions` (SURVEY §2.7's
  * batch shape), so an offline log never funnels its texts through
  * the driver. 0 forces the distributed path. Both paths are
  * row-identical by construction (CascadeBatchSpec pins it).
  *
  * `broadcastQueryMax`: the batch cascades BROADCAST the resolved
  * query frame (the pair stream is corpus × broadcast(queries)), which
  * bounds a single plan at a broadcastable query side. Logs larger
  * than this are hash-sliced by qid and served as SEQUENTIAL per-slice
  * plans whose bounded results union (the CascadeServe slicer idiom,
  * automatic) — so a 10M+ offline log runs without a manual knob. 0
  * (the default) derives the bound WIDTH-AWARE from the JVM heap:
  * 1/16 of the heap in broadcast bytes divided by the log's MEASURED
  * row width (a bounded 32-row probe of vector dims + text length) — a
  * 32 GiB driver derives ~2M queries per slice at dim 64 but only
  * ~240k at the reference's dim 1024, where a flat rows-per-GiB
  * constant would admit ~8× the budget and abort the broadcast at
  * `maxResultSize`. Positive values override (rows, taken verbatim);
  * the slices are hash-sized in expectation, not exactly, so the
  * slicer targets 80% of the budget per slice as skew headroom. */
final case class CascadeConfig(
    topK: Int = 10,
    relaxThreshold: Int = 5,
    fallbackThreshold: Int = 15,
    fallbackK: Int = 15,
    finalN: Int = 5,
    wJudge: Double = 0.7,
    wRule: Double = 0.3,
    semanticDriverBatchMax: Int = 1024,
    broadcastQueryMax: Int = 0)

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
    MultiStageSearch.isBlankText(queryText)

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

  /** Per-search-call candidate source: (stage predicate, k) → the
    * stage's ≤k rows. Null-distance rows (null embedding, null
    * element, dim mismatch) are excluded BEFORE the top-k cut (the
    * [[Knn.exactDefined]] contract): Spark's ascending sort is NULLS
    * FIRST, so they would otherwise rank at the top and eat the
    * stage's k — and the batch forms exclude them by construction, so
    * this is also what keeps `batch == per-query` on corpora with null
    * embeddings (CascadeBatchSpec pins it). A custom `knnBackend` owns
    * the same contract: never surface null-dist rows.
    *
    * The default (exact-scan) source computes the scored corpus —
    * (id, text, dist) — ONCE per search call and lazily checkpoints
    * it; every stage is then filter ∘ TakeOrderedAndProject over the
    * narrow materialized frame (round 22, guide §2.4 "remove shuffles/
    * passes outright"): the multi-stage cascade previously re-scanned
    * the corpus AND recomputed the query distance once PER STAGE
    * (7× for the flagship ladder), when the only thing that differs
    * between stages is a text predicate and k. Stage results are
    * bit-identical: distance is the same expression computed on the
    * same rows (filter ∘ dist commutes per-row), and the (dist, id)
    * top-k order is unchanged. The materialized frame holds the three
    * narrow columns only — never the embeddings — and spills to disk
    * via the localCheckpoint storage level; at corpus scale that one
    * narrow materialization replaces nStages full scans each paying
    * the distance arithmetic over every embedding.
    *
    * EAGER checkpoint, deliberately: [[searchGated]]'s gate-count
    * broadcasts execute their subtrees as CONCURRENT jobs, and a lazy
    * checkpoint dedupes nothing until its first computation finishes —
    * measured 7-way duplicate scan+distance races (c7 2.1 s → 3.4 s
    * under the lazy form; 0.6 s eager). One synchronous job here,
    * cached blocks for every stage after. */
  private def stageSource(queryVec: Column)
      : (Option[Column], Int) => DataFrame = knnBackend match {
    case Some(backend) => (pred, k) => backend(pred, queryVec, k)
    case None =>
      val scored = corpus
        .withColumn("dist", VectorFunctions.l2(col(embCol), queryVec))
        .filter(col("dist").isNotNull)
        .select(col(idCol), col(textCol), col("dist"))
        .localCheckpoint(true)
      (pred, k) => pred.fold(scored)(scored.filter)
        .orderBy(col("dist"), col(idCol)).limit(k)
  }

  /** One cascade stage's candidates, tagged with its rank. */
  private def knnStage(source: (Option[Column], Int) => DataFrame,
                       pred: Option[Column], k: Int, stage: Int): DataFrame =
    source(pred, k).withColumn("stage_rank", lit(stage))

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
    val source = stageSource(queryVec)
    var collected = Vector.empty[Row]
    var rowSchema: StructType = null
    var nextStage = 1
    def addStage(pred: Option[Column], k: Int): Unit = {
      val df = knnStage(source, pred, k, nextStage)
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
    * single-partition sort is a handful of rows, not a scale concern —
    * this is the source of the "No Partition Defined for Window"
    * warnings Verify logs: INTENTIONAL on these bounded final-rank
    * projections (the r20 verdict's carry-over note; same pattern as
    * [[graft.operators.Bm25.rankBounded]]). */
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
    val source = stageSource(queryVec)
    val perStage = stages.zipWithIndex.map { case ((pred, k), i) =>
      knnStage(source, pred, k, i + 1)
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

    val source = stageSource(queryVec)
    // EAGER ≤k-row checkpoints (round 22): each stage frame is read up
    // to 3× (two gate counts + the union), and as LAZY checkpoints the
    // gate-count broadcasts materialized them as a swarm of ~50
    // concurrent duplicate jobs (profiled: 59 jobs, most re-running
    // stage subtrees before any checkpoint landed). Eager = exactly one
    // tiny job per stage over the cached scored source; every gate
    // count and the union then reads ≤k cached rows, and the final
    // plan shrinks from repeated stage subtrees to ExistingRDD scans.
    def stageFrame(pred: Option[Column], k: Int): DataFrame =
      knnStage(source, pred, k, 0)
        .select(col(idCol), col(textCol), col("dist"))
        .localCheckpoint(true)
    // Each 1-ROW count frame is eagerly checkpointed (round 22): n1/n2/
    // n6 are referenced up to 3× each (stage gates + the gflags rank
    // frame), and as live subtrees every reference re-embedded the
    // whole union-of-stages aggregate — the final plan carried ~3.9k
    // operator lines and Catalyst spent a profiled ~0.7 s optimizing
    // it. As ExistingRDD leaves the same plan is ~200 lines; the gate
    // algebra itself is unchanged and still entirely in-plan.
    def distinctIds(dfs: Seq[DataFrame]): DataFrame =
      dfs.map(_.select(col(idCol))).reduce(_ unionByName _)
        .agg(count_distinct(col(idCol)).as("__n"))
        .localCheckpoint(true)

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

  /** [[searchGated]] for a BATCH of queries, as ONE data-parallel
    * plan — queries are rows, not driver round-trips. The per-query
    * form scans the corpus once per stage per query (7·|Q| scans for a
    * query log); this form scans it TWICE TOTAL regardless of |Q|:
    *
    *  1. candidates: corpus ⨯ broadcast(queries) computes each pair's
    *     distance ONCE, tags it with the stage slots whose predicate
    *     it satisfies (slot masks are per-pair boolean expressions over
    *     the query's terms, carried as columns), and feeds ONE
    *     (qid, slot)-keyed bounded [[TopK]] aggregation — partial
    *     k-heaps map-side, so the single shuffle carries ≤ k rows per
    *     (partition × query × slot), never the corpus;
    *  2. text fetch: the surviving ≤ Σk·|Q| candidate ids broadcast-
    *     join back to the corpus for the rerank text.
    *
    * The gate ladder runs per query as ARRAY expressions over the
    * pivoted stage heaps (one row per qid): running distinct-id counts
    * via array_distinct/concat, gated stages kept or emptied by
    * when(), ran-only stage renumbering from the same gate indicators
    * — the exact algebra of [[searchGated]], evaluated |Q| times in
    * one narrow map instead of |Q| driver plans. Per-query results are
    * row-identical to [[searchGated]] (CascadeBatchSpec pins the
    * identity across all four query structures; c9 hash-checks the
    * batch against per-query DuckDB replays).
    *
    * The semantic boundary is scale-dispatched (see [[batchPrelude]]):
    * request-sized batches resolve NER/synonyms on the driver from the
    * collected (qid, text) pairs (the reference's per-request shape);
    * larger query logs resolve them inside the cluster via
    * `mapPartitions` — the driver never holds the texts. Vectors never
    * go near the boundary either way. Blank queries contribute zero
    * rows (the F4 guard, batch-shaped). Integral ids are REQUIRED on
    * both sides (the
    * candidate entry is (double, long)) and enforced eagerly
    * ([[Ann.requireIntegralId]]) — the internal non-ANSI long cast
    * would null non-numeric ids and silently drop their rows; not
    * available with a custom `knnBackend` — the batch plan IS the
    * candidate source.
    *
    * The query source must be DETERMINISTIC across re-scans: an
    * over-budget log is auto-sliced (see `sliceDispatch`), which
    * re-scans `queries` for the size probe, the count, and once per
    * slice rather than pinning a 10M-row vector-bearing frame whole. A
    * source whose rows shift between scans — `sample()`, a `limit`
    * over shuffled data, `rand()`-derived qids — can drop or duplicate
    * queries across slices in ways the per-slice duplicate guard
    * cannot see. Checkpoint such a source first (`localCheckpoint` or
    * a parquet round-trip); files, tables, and deterministic
    * transforms over them need nothing. */
  def searchGatedBatch(queries: DataFrame, qidCol: String,
                       qtextCol: String, qvecCol: String): DataFrame = {
    require(knnBackend.isEmpty,
      "searchGatedBatch builds its own batched candidate plan and cannot " +
        "honor a custom knnBackend — use per-query searchGated for served " +
        "backends, or searchGatedBatchServed over a cluster-assigned index")
    Ann.requireIntegralId(corpus, idCol, "searchGatedBatch", "corpus id")
    Ann.requireIntegralId(queries, qidCol, "searchGatedBatch", "query id")
    def one(q: DataFrame): DataFrame =
      batchPrelude("searchGatedBatch", q, qidCol, qtextCol, qvecCol) match {
        case Left(empty) => empty
        case Right((nerDf, maxSyn, qframe)) =>
          gatedBatchCore(qidCol, nerDf, maxSyn,
            corpus.crossJoin(broadcast(qframe)))
      }
    sliceDispatch(queries, qidCol, qtextCol, qvecCol)(one)
      .getOrElse(one(queries))
  }

  /** [[searchGatedBatch]] over a cluster-assigned (IVF) index — the
    * high-QPS serving shape: the exact batch's pair stream touches
    * |corpus|·|Q| rows, this one touches only the pairs whose corpus
    * row lives in a cluster the query PROBES. The per-query probe list
    * (nprobe nearest centroids, ties by centroid id — the c5/c8 rule,
    * columnar) becomes a (qid, cluster_id) map; joining the index on
    * cluster_id against it REPLACES the cross join, so each index row
    * meets only the queries probing its cluster — the pair stream
    * shrinks by ~nprobe/k and, over a stored partitioned index, the
    * scan itself prunes to the union of probed clusters. Per-query
    * results are row-identical to [[searchGated]] with the equivalent
    * served backend (CascadeBatchSpec pins it); the gate ladder,
    * dedup, and rerank are [[gatedBatchCore]]'s, unchanged. Same
    * deterministic-query-source requirement as [[searchGatedBatch]]
    * (the auto-slicer re-scans the log; see that scaladoc). */
  def searchGatedBatchServed(queries: DataFrame, qidCol: String,
                             qtextCol: String, qvecCol: String,
                             centroids: DataFrame, cidCol: String,
                             cvecCol: String, nprobe: Int): DataFrame = {
    require(knnBackend.isEmpty,
      "searchGatedBatchServed probes the cluster-assigned corpus itself " +
        "and cannot honor a custom knnBackend")
    require(nprobe >= 1, s"nprobe $nprobe must be >= 1")
    require(corpus.columns.contains("cluster_id"),
      "searchGatedBatchServed needs a cluster-assigned corpus " +
        "(cluster_id column, from Ann.ivfAssign*)")
    Ann.requireIntegralId(corpus, idCol, "searchGatedBatchServed",
      "corpus id")
    Ann.requireIntegralId(queries, qidCol, "searchGatedBatchServed",
      "query id")
    def one(q: DataFrame): DataFrame =
      batchPrelude("searchGatedBatchServed", q, qidCol, qtextCol,
          qvecCol) match {
        case Left(empty) => empty
        case Right((nerDf, maxSyn, qframe)) =>
          val cent = centroids.select(col(cidCol).cast("long").as("__cid"),
            col(cvecCol).cast("array<double>").as("__cvec"))
          val wp = Window.partitionBy("__qid")
            .orderBy(col("__cd"), col("__cid"))
          val probeMap = qframe.select(col("__qid"), col("__qv"))
            .crossJoin(broadcast(cent))
            .withColumn("__cd", VectorFunctions.l2(col("__cvec"), col("__qv")))
            .withColumn("__pr", row_number().over(wp))
            .filter(col("__pr") <= nprobe)
            .select(col("__qid"), col("__cid"))
          val qprobe = qframe.join(probeMap, "__qid")
          gatedBatchCore(qidCol, nerDf, maxSyn,
            corpus.join(broadcast(qprobe),
              col("cluster_id").cast("long") === col("__cid")))
      }
    // the served form's broadcast frame is qprobe — |Q| · nprobe rows,
    // not |Q| — so its slice budget divides by nprobe (the exact form
    // broadcasts qframe itself and keeps the full budget)
    sliceDispatch(queries, qidCol, qtextCol, qvecCol,
        budgetDivisor = nprobe)(one)
      .getOrElse(one(queries))
  }

  /** The 10M+-log escape hatch, automatic: a query log larger than the
    * broadcast budget ([[CascadeConfig.broadcastQueryMax]]) is
    * hash-sliced by qid and each slice served as its OWN plan,
    * SEQUENTIALLY — only one slice's query broadcast and pair stream
    * are ever live, because each slice's bounded result (≤ finalN·
    * |slice| rows, no vectors) is eagerly materialized
    * (localCheckpoint) before the next slice starts; the returned
    * frame is the cheap union of the materialized results. This is
    * [[graft.streaming.CascadeServe]]'s `maxBatchQueries` slicer
    * turned into an engine-side dispatch with a memory-derived
    * default, so the batch forms stop being bounded by a single
    * broadcastable query frame.
    *
    * Size detection is a LIMIT-probe (scan at most maxQ+1 qids), so
    * in-budget logs — the common case — never pay a full count; the
    * exact count (and so the slice count) is computed only on the
    * over-budget path. Per-slice work sums to the unsliced plan's
    * (each slice resolves only its own queries; the corpus is scanned
    * once per slice instead of once — the price of bounding memory).
    * Duplicate qids land in the SAME hash slice, so the per-slice
    * prelude guard still catches them. The query source is re-scanned
    * once per slice rather than checkpointed: a 10M-row vector-bearing
    * log is exactly what must NOT be pinned whole — which is why the
    * source must be DETERMINISTIC across re-scans (see the entry
    * points' scaladoc). `budgetDivisor` scales the budget to the
    * caller's broadcast WIDTH: the served form broadcasts |Q| · nprobe
    * probe rows per slice, so it passes nprobe. Slices are hash-sized
    * only in EXPECTATION, so the slice count targets 80% of the
    * budget: at small slice counts binomial skew routinely pushes one
    * slice ~10% past n/nSlices, and the budget guards a memory cliff
    * (broadcast abort at `maxResultSize`), not a soft target — the
    * headroom makes the expected worst slice land under it. Returns
    * None when the log fits the budget — the caller runs the
    * single-plan form. */
  private def sliceDispatch(queries: DataFrame, qidCol: String,
                            qtextCol: String, qvecCol: String,
                            budgetDivisor: Int = 1)
      (perSlice: DataFrame => DataFrame): Option[DataFrame] = {
    val maxQ = resolvedBroadcastQueryMax(queries, qtextCol, qvecCol,
      budgetDivisor)
    val over = queries.select(col(qidCol)).limit(maxQ + 1).count() > maxQ
    if (!over) return None
    val n = queries.count()
    // 80% of the budget per slice, ROUNDED: floor would turn a tiny
    // explicit override (maxQ=2, the c11 harness shape) into 1-query
    // slices and double its deliberate slicing tax, while at derived
    // scale (~millions) round vs floor is noise and the headroom holds
    val target = math.max(1L, math.round(maxQ * 0.8))
    val nSlices = math.min(Int.MaxValue.toLong,
      (n + target - 1) / target).toInt
    val parts = (0 until nSlices).map { j =>
      perSlice(queries.filter(
          pmod(hash(col(qidCol)), lit(nSlices)) === j))
        .localCheckpoint(true)
    }
    Some(parts.reduce(_ unionByName _))
  }

  /** The per-slice query budget, in ROWS. A positive
    * `cfg.broadcastQueryMax` wins verbatim (a deployment that knows
    * its row width); the 0 default derives it WIDTH-AWARE from the JVM
    * heap: 1/16 of the heap in broadcast bytes, divided by the query
    * log's MEASURED row width (one bounded probe of `size(qvec)` +
    * `length(qtext)`, [[MultiStageSearch.probedQueryRowBytes]]) —
    * never a flat rows-per-GiB constant. The flat ~1 KiB/row
    * assumption this replaces was only right near dim 64: at the
    * reference's own 1024-dim embeddings a resolved row carries ~8 KiB
    * of `array<double>` alone, so the old default admitted ~8× the
    * intended broadcast bytes — reproducing the exact `maxResultSize`
    * abort the slicer exists to prevent (the round-16 10M probe
    * measured that kill). Both forms divide by `budgetDivisor`: the
    * served form's broadcast is |Q| · nprobe probe rows, not |Q|. */
  private[graft] def resolvedBroadcastQueryMax(
      queries: DataFrame, qtextCol: String, qvecCol: String,
      budgetDivisor: Int = 1): Int = {
    val base: Long =
      if (cfg.broadcastQueryMax > 0) cfg.broadcastQueryMax.toLong
      else {
        // the abort the budget guards is the BroadcastExchange collect
        // crossing spark.driver.maxResultSize, so the byte budget must
        // respect the session's ACTUAL limit, not just heap/16 — a
        // 32 GiB driver at the default 1g maxResultSize would
        // otherwise derive 2 GiB slices that still die at collect
        // (bare numbers are MiB, Spark's own rule for this key; 0 =
        // unlimited, heap-only budget)
        val mrs = queries.sparkSession.sparkContext.getConf
          .getSizeAsMb("spark.driver.maxResultSize", "1g") << 20
        MultiStageSearch.broadcastBudgetRows(
          MultiStageSearch.probedQueryRowBytes(queries, qtextCol, qvecCol),
          Runtime.getRuntime.maxMemory, mrs)
      }
    math.max(1L, math.min(base / math.max(1, budgetDivisor),
      Int.MaxValue.toLong - 1)).toInt
  }

  /** Shared batch prelude: the SEMANTIC boundary, scale-dispatched.
    * Only (qid, text) ever feeds NER/synonym resolution (L2/L3 are
    * external calls — vectors never go near them); HOW it runs depends
    * on the batch size, limit-probed with `semanticDriverBatchMax + 1`
    * rows (the d6 limit-probe idiom — a request-sized batch is
    * collected WHOLE by the probe itself, so the dispatch costs
    * nothing extra on the path it picks):
    *
    *  - request-sized (≤ `cfg.semanticDriverBatchMax`): resolved on
    *    the driver, one call per query — the reference's per-request
    *    shape, no Spark job;
    *  - larger (an offline query log): resolved INSIDE the cluster via
    *    `mapPartitions` over the (qid, text) projection — SURVEY
    *    §2.7's prescribed batch shape — with the duplicate-qid guard
    *    as a counts-only aggregate and the ner frame localCheckpointed
    *    (it is read 3× downstream: isEmpty, syn-width, joins). The
    *    texts are never COLLECTED to the driver for resolution (the
    *    round-15 probe measured the driver path collapsing at 1M
    *    queries); the resolved compact frame IS still broadcast,
    *    because the whole batch design broadcasts the query side (the
    *    pair stream is corpus × broadcast(queries)) — so a SINGLE
    *    plan stays bounded by a broadcastable query frame. Logs
    *    beyond that bound no longer need a manual knob: the public
    *    batch entry points auto-slice them BEFORE this prelude runs
    *    ([[MultiStageSearch.sliceDispatch]],
    *    `cfg.broadcastQueryMax`), so every batch that reaches here
    *    is already within the broadcast budget.
    *
    * Both paths produce the identical ner frame through the same
    * [[MultiStageSearch.resolveQuery]] (CascadeBatchSpec pins
    * driver == distributed on the full output). Returns the
    * broadcastable ner frame, the batch's synonym-slot width, and the
    * query frame (vectors stay distributed); Left(typed empty) when
    * every query is blank. */
  private def batchPrelude(op: String, queries: DataFrame, qidCol: String,
                           qtextCol: String, qvecCol: String)
      : Either[DataFrame, (DataFrame, Int, DataFrame)] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    def typedEmpty = Left(emptyResponse.crossJoin(
        spark.range(0).select(col("id").as("__qid")))
      .select(batchOutCols(qidCol): _*))
    // clamp to [0, MaxValue - 1]: the probe fetches lim + 1 rows, and
    // a caller pinning the driver path with Int.MaxValue must not
    // overflow the limit into a negative
    val lim = math.min(math.max(cfg.semanticDriverBatchMax, 0),
      Int.MaxValue - 1)
    val probe = queries
      .select(col(qidCol).cast("long"), col(qtextCol).cast("string"))
      .limit(lim + 1).collect()
    val (nerSrc, maxSyn): (DataFrame, Int) =
      if (probe.length <= lim) {
        val qmeta = probe.toSeq.map(r => (r.getLong(0), r.getString(1)))
        require(qmeta.map(_._1).distinct.length == qmeta.length,
          s"$op: duplicate $qidCol values in the query batch")
        val resolved = qmeta.flatMap { case (qid, t) =>
          MultiStageSearch.resolveQuery(queryNer, synonyms, profile, qid, t)
        }
        if (resolved.isEmpty) return typedEmpty
        (resolved.toDF("__qid", "__job", "__region", "__age", "__syns"),
          resolved.map(_._5.length).max)
      } else {
        val dups = queries.groupBy(col(qidCol)).count()
          .filter(col("count") > 1).limit(1).count()
        require(dups == 0,
          s"$op: duplicate $qidCol values in the query batch")
        // locals only — the task closure must not capture `this`
        // (MultiStageSearch holds DataFrames)
        val (qn, syn, prof) = (queryNer, synonyms, profile)
        val ner = queries
          .select(col(qidCol).cast("long"), col(qtextCol).cast("string"))
          .as[(Long, String)]
          .mapPartitions(_.flatMap { case (qid, t) =>
            MultiStageSearch.resolveQuery(qn, syn, prof, qid, t)
          })
          .toDF("__qid", "__job", "__region", "__age", "__syns")
          .localCheckpoint(true)
        if (ner.isEmpty) return typedEmpty
        (ner, ner.agg(max(size(col("__syns")))).collect()(0).getInt(0))
      }
    val nerDf = broadcast(nerSrc)
    val qframe = queries
      .select(col(qidCol).cast("long").as("__qid"),
        col(qvecCol).cast("array<double>").as("__qv"))
      .join(nerDf, "__qid") // inner join drops blank queries
    Right((nerDf, maxSyn, qframe))
  }

  private def batchOutCols(qidCol: String): Seq[Column] =
    Seq(col("__qid").as(qidCol), col(idCol), col(textCol),
      col("dist"), col("stage_rank"), col("judge_score"), col("rule_score"),
      col("score"), col("rank"))

  /** The batched gate-ladder pipeline over an already-joined
    * (corpus row × query) pair stream: slot masks → windowed top-k per
    * (qid, slot) → per-qid gate algebra → keep-first dedup → text
    * fetch → rerank. Shared verbatim by the exact and the served batch
    * — only the pair stream differs, which is exactly the
    * backend-independence the single-query identity gates pin. */
  private def gatedBatchCore(qidCol: String, nerDf: DataFrame, maxSyn: Int,
                             paired: DataFrame): DataFrame = {
    val lt = lower(col(textCol))
    def cterm(t: Column): Column = lt.contains(lower(t))
    val cr = col("__region").isNotNull && cterm(col("__region"))
    val cj = col("__job").isNotNull && cterm(col("__job"))
    val s1ok = when(col("__region").isNotNull && col("__job").isNotNull, cr && cj)
      .when(col("__region").isNotNull, cr)
      .when(col("__job").isNotNull, cj)
      .otherwise(lit(true))
    val s2ok = col("__region").isNotNull && col("__job").isNotNull && (cr || cj)
    val synOks = (0 until maxSyn).map { i =>
      val sy = get(col("__syns"), lit(i)) // null-safe past the end
      sy.isNotNull &&
        when(col("__region").isNotNull, cr && cterm(sy)).otherwise(cterm(sy))
    }
    val fallbackSlot = 5 + maxSyn
    val slots = Seq((1, s1ok), (2, s2ok), (3, cr), (4, cj)) ++
      synOks.zipWithIndex.map { case (ok, i) => (5 + i, ok) } :+
      ((fallbackSlot, lit(true): Column))
    val maxK = math.max(cfg.topK, cfg.fallbackK)
    // null-embedding rows carry a null distance and are excluded from
    // every slot BEFORE the per-slot cut — the same contract the
    // single-query form's stages enforce via Knn.exactDefined (a null
    // dist would otherwise rank FIRST under Spark's ascending NULLS
    // FIRST and eat the stage's k), so batch == per-query holds on
    // corpora with null embeddings
    val pairs = paired
      .select(col("__qid"),
        col(idCol).cast("long").as("__id"),
        VectorFunctions.l2(col(embCol), col("__qv")).as("__dist"),
        array(slots.map { case (s, ok) =>
          struct(lit(s).as("slot"), ok.as("ok"))
        }: _*).as("__slots"))
      .filter(col("__dist").isNotNull)
      .select(col("__qid"), col("__id"), col("__dist"),
        explode(col("__slots")).as("__e"))
      .filter(col("__e").getField("ok"))
      .select(col("__qid"), col("__e").getField("slot").as("__slot"),
        col("__dist"), col("__id"))
    // Per-(qid, slot) top-k via a rank-limit window rather than the
    // TopK Aggregator: the `row_number <= k` filter triggers Spark's
    // InferWindowGroupLimit, which inserts a PARTIAL group-limit
    // before the exchange, so ≤ maxK rows per (map partition × qid ×
    // slot) cross it — the same bound the Aggregator's partial heaps
    // give. A controlled A/B (identical materialized 10M-row pair
    // stream, interleaved, quiet box — PLANS.md round-14 correction)
    // measured the two forms EQUAL on wall-clock; the window form is
    // kept because it is native end-to-end (no Aggregator buffer
    // tuning, plan-auditable via the WindowGroupLimit node), not
    // because it is faster. array_sort on (dist, id) structs keeps
    // the stored order total, as TopK did.
    val wTop = Window.partitionBy("__qid", "__slot")
      .orderBy(col("__dist"), col("__id"))
    val grouped = pairs
      .withColumn("__rn", row_number().over(wTop))
      .filter(col("__rn") <= maxK)
      .groupBy("__qid", "__slot")
      .agg(array_sort(collect_list(
        struct(col("__dist").as("dist"), col("__id").as("id")))).as("__cand"))
      .withColumn("__cand", slice(col("__cand"), lit(1),
        when(col("__slot") === fallbackSlot, cfg.fallbackK)
          .otherwise(cfg.topK)))

    // -- pivot to one row per qid; absent slots coalesce to empty
    val slotAgg = (1 to fallbackSlot).map(s =>
      first(when(col("__slot") === s, col("__cand")), ignoreNulls = true)
        .as(s"__a$s"))
    val emptyArr = typedlit(Seq.empty[TopK.Entry])
    def nn(c: Column): Column = coalesce(c, emptyArr)
    def ids(c: Column): Column = transform(c, _.getField("id"))
    val perQ = grouped.groupBy("__qid")
      .agg(slotAgg.head, slotAgg.tail: _*)
      .join(nerDf, "__qid")

    // -- the gate ladder, per qid, as array expressions (searchGated's
    //    exact algebra: counts over gated unions, ran-only renumbering)
    val s2exists = col("__job").isNotNull && col("__region").isNotNull
    val n1 = size(array_distinct(ids(nn(col("__a1")))))
    val g2 = s2exists && (n1 < cfg.relaxThreshold)
    val inc2 = when(g2, nn(col("__a2"))).otherwise(emptyArr)
    val n2 = size(array_distinct(
      concat(ids(nn(col("__a1"))), ids(inc2))))
    val g3 = n2 < cfg.relaxThreshold
    val inc3 = when(col("__region").isNotNull && g3, nn(col("__a3")))
      .otherwise(emptyArr)
    val inc4 = when(col("__job").isNotNull && g3, nn(col("__a4")))
      .otherwise(emptyArr)
    val incSyn = (0 until maxSyn).map(i =>
      when(size(col("__syns")) > i, nn(col(s"__a${5 + i}")))
        .otherwise(emptyArr))
    val n6 = size(array_distinct(
      (Seq(ids(nn(col("__a1"))), ids(inc2), ids(inc3), ids(inc4)) ++
        incSyn.map(ids)).reduce(concat(_, _))))
    val g5 = n6 < cfg.fallbackThreshold
    val inc7 = when(g5, nn(col(s"__a$fallbackSlot"))).otherwise(emptyArr)
    val i2 = when(g2, 1).otherwise(0)
    val nSingle = when(col("__region").isNotNull, 1).otherwise(0) +
      when(col("__job").isNotNull, 1).otherwise(0)
    val i3 = when(g3, nSingle).otherwise(0)
    def fr(rank: Column, arr: Column) =
      struct(rank.cast("int").as("sr"), arr.as("arr"))
    val frames = array(
      Seq(fr(lit(1), nn(col("__a1"))),
        fr(lit(2), inc2),
        fr(lit(2) + i2, inc3),
        fr(lit(2) + i2 + when(col("__region").isNotNull, 1).otherwise(0), inc4)) ++
        incSyn.zipWithIndex.map { case (a, m) => fr(lit(2 + m) + i2 + i3, a) } :+
        fr(lit(2) + size(col("__syns")) + i2 + i3, inc7): _*)
    val cand = perQ
      .select(col("__qid"), explode(frames).as("__f"))
      .select(col("__qid"), col("__f").getField("sr").as("stage_rank"),
        explode(col("__f").getField("arr")).as("__e"))
      .select(col("__qid"), col("stage_rank"),
        col("__e").getField("dist").as("dist"),
        col("__e").getField("id").as("__id"))

    // -- keep-first dedup per (qid, id), then pass 2 (text) + rerank
    val deduped = Dedup.keepFirst(cand, Seq("__qid", "__id"),
      Seq(col("stage_rank"), col("dist"), col("__id")))
    val withText = broadcast(deduped)
      .join(corpus.select(col(idCol).cast("long").as("__id"),
        col(textCol)), "__id")
      .join(nerDf, "__qid")
    val jb = lower(col("__job"))
    val rg = lower(col("__region"))
    val hits = when(col("__job").isNotNull && lt.contains(jb), 1).otherwise(0) +
      when(col("__region").isNotNull && lt.contains(rg), 1).otherwise(0)
    val nTok = when(col("__job").isNotNull, 1).otherwise(0) +
      when(col("__region").isNotNull, 1).otherwise(0)
    val (dJob, dRegion) = docNer(col(textCol))
    val scored = withText
      .withColumn("judge_score",
        when(nTok === 0, lit(0.0))
          .otherwise(round(lit(5.0) * hits / nTok, 0).cast("double")))
      .withColumn("rule_score", Rerank.nerOverlap(Seq(
        (coalesce(col("__job"), lit("")), dJob),
        (coalesce(col("__region"), lit("")), dRegion),
        (coalesce(col("__age"), lit("")), lit("")))))
      .withColumn("score",
        Rerank.combined(col("judge_score"), col("rule_score"),
          cfg.wJudge, cfg.wRule))
    val wq = Window.partitionBy("__qid")
      .orderBy(desc("score"), asc("dist"), asc("__id"))
    scored.withColumn("rank", row_number().over(wq))
      .filter(col("rank") <= cfg.finalN)
      .withColumn(idCol, col("__id").cast(corpus.schema(idCol).dataType))
      .select(batchOutCols(qidCol): _*)
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

object MultiStageSearch {

  private[operators] def isBlankText(t: String): Boolean =
    t == null || t.trim.isEmpty

  /** One query's semantic resolution — the F4 blank guard, L2 NER +
    * profile coalesce, L3 synonyms — as a pure function of the
    * (serializable) semantic doubles, shared verbatim by the batch
    * prelude's driver-collect and `mapPartitions` paths so the two are
    * identical by construction. None = blank query (contributes no
    * row, the batch-shaped F4 guard). */
  private[operators] def resolveQuery(qn: RuleQueryNer, syn: DictSynonyms,
      prof: UserProfile, qid: Long, t: String)
      : Option[(Long, String, String, String, Seq[String])] =
    if (isBlankText(t)) None
    else {
      val ner = qn(t).withDefaults(prof)
      Some((qid, ner.job.orNull, ner.region.orNull, ner.ageGroup.orNull,
        ner.job.toSeq.flatMap(syn(_))))
    }

  /** Fixed per-row overhead charged on top of the measured vector and
    * text bytes: the resolved ner/synonym fields, UnsafeRow struct
    * headers, and broadcast-side object slack. 512 B keeps the dim-64
    * derivation where the round-16 probe validated it (~1 KiB rows ⇒
    * ~2M queries per 32 GiB driver). */
  private[graft] val QueryRowOverheadBytes = 512L

  /** The query log's in-broadcast row width, MEASURED: one bounded
    * probe (LIMIT 32 over non-null-vector rows, a single tiny task) of
    * max `size(qvec)` × 8 B (`array<double>`) + max `length(qtext)` ×
    * 2 B (UTF-16 slack over UTF8String) + [[QueryRowOverheadBytes]].
    * The MAX over a small sample, not the first row: vector width is
    * constant per log but text lengths vary, and a short-text first
    * row would under-report the width and re-admit part of the
    * over-broadcast. Rows with a null vector are skipped (same
    * under-report hazard); an all-null or empty log measures overhead
    * only — correct, those rows broadcast no vector bytes. One probe
    * per batch dispatch, paid on the in-budget path too — a 32-row
    * scan is noise next to the prelude's own limit-probe. */
  private[graft] def probedQueryRowBytes(queries: DataFrame,
      qtextCol: String, qvecCol: String): Long = {
    val probe = queries
      .filter(col(qvecCol).isNotNull)
      .select(
        coalesce(size(col(qvecCol).cast("array<double>")), lit(0)).as("d"),
        coalesce(length(col(qtextCol).cast("string")), lit(0)).as("t"))
      .limit(32)
      .agg(coalesce(max(col("d")), lit(0)).as("d"),
        coalesce(max(col("t")), lit(0)).as("t"))
      .collect()
    val (dims, chars) =
      if (probe.isEmpty) (0, 0) else (probe(0).getInt(0), probe(0).getInt(1))
    8L * dims + 2L * chars + QueryRowOverheadBytes
  }

  /** (heap, maxResultSize) → per-slice query-row budget: the LESSER of
    * 1/16 of the heap (the round-16-validated ratio — at ~1 KiB rows
    * this IS the old heapGiB × 65536 constant) and HALF the driver's
    * `maxResultSize` (the broadcast collect is what actually aborts;
    * half leaves room for the task-result framing and any concurrent
    * collect), divided by the measured row width instead of an assumed
    * one. `maxResultBytes <= 0` = unlimited (Spark's own 0 semantics
    * for the key) — heap-only budget. */
  private[graft] def broadcastBudgetRows(rowBytes: Long,
      heapBytes: Long, maxResultBytes: Long): Long = {
    val heapBudget = math.max(1L, heapBytes / 16)
    val mrsBudget =
      if (maxResultBytes <= 0) Long.MaxValue
      else math.max(1L, maxResultBytes / 2)
    math.max(1L, math.min(heapBudget, mrsBudget) / math.max(1L, rowBytes))
  }
}
