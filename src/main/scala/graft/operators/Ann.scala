package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbor scale path: IVF (inverted-file) over a
  * centroid table (SURVEY.md §2.5 V1/V2 north star; the reference's
  * HNSW index — /root/reference/main.py:55 — is replaced by a
  * partition-prunable layout, which is the Spark-native equivalent).
  *
  * Shape for 100 TB: `assign` is ONE narrow pass over the corpus — the
  * centroid table (k rows) broadcasts, so no corpus shuffle. Writing
  * the assigned table `partitionBy("cluster_id")` makes every later
  * query scan only the probed clusters (partition pruning); `search`
  * then runs exact top-k inside nprobe clusters — candidates shrink by
  * ~k/nprobe versus a full scan while the plan stays
  * filter ∘ distance ∘ TakeOrderedAndProject with no shuffle.
  */
object Ann {

  /** Train IVF centroids with MLlib KMeans (seed-deterministic). The
    * toy queries use "first k vectors" as centroids for oracle
    * simplicity; a real index trains them — this is that path, and its
    * output feeds [[ivfAssignBig]]/[[ivfSearchStore]] unchanged.
    * Training cost is bounded: KMeans samples its init and each
    * iteration is one narrow pass + a k×dim reduce. */
  def trainCentroids(corpus: DataFrame, embCol: String, k: Int,
                     seed: Long = 42L, maxIter: Int = 20): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val data = corpus.select(
      array_to_vector(col(embCol).cast("array<double>")).as("__vec"))
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("__vec").fit(data)
    val spark = corpus.sparkSession
    import spark.implicits._
    model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i.toLong, c.toArray) }
      .toDF("cid", "cvec")
  }

  /** Assign each corpus vector to its nearest centroid (L2, ties by
    * centroid id). The centroid table is k rows BY DEFINITION, so it is
    * collected once at plan-build time and inlined as a literal struct
    * array: the assignment is `array_min` over (dist, cid) structs — a
    * pure narrow map over the corpus with NO shuffle and NO join (a
    * window over a crossJoin would shuffle n·k rows by id). */
  def ivfAssign(corpus: DataFrame, embCol: String, idCol: String,
                centroids: DataFrame, cidCol: String, cvecCol: String): DataFrame = {
    // collectCentroids casts the vector column to array<double>, so a
    // float parquet table and trainCentroids' double output both work.
    val cents = collectCentroids(centroids, cidCol, cvecCol)
    // array_min orders structs lexicographically: min distance first,
    // then min centroid id — the deterministic tie-break for free.
    // Degenerate rows must not assign silently: a null distance (null
    // embedding, null element, or dim mismatch) sorts FIRST in struct
    // order, so unguarded array_min would hand such rows cluster
    // min-cid. Contract (same as ivfAssignBig): null embedding → null
    // cluster_id; a non-null embedding whose distance is null (dim
    // mismatch / null element) fails loudly.
    val best = bestCentroid(cents, embCol)
    corpus.withColumn("cluster_id",
      when(col(embCol).isNull, lit(null).cast("long"))
        .when(best.getField("d").isNull,
          raise_error(concat(
            lit("ivfAssign: null distance (dim mismatch or null element) for id "),
            col(idCol).cast("string"))))
        .otherwise(best.getField("cid")))
  }

  /** The literal-inline argmin over a collected centroid table:
    * struct(d, cid) of the nearest centroid (L2, ties by min cid) — a
    * pure narrow expression with NO shuffle and NO join. Shared by
    * [[ivfAssign]] (which surfaces cid) and [[clusterAudit]] (which
    * also needs d, and must measure it against the SAME collected
    * snapshot the assignment used). */
  private def bestCentroid(cents: Array[(Long, Array[Double])],
                           embCol: String): Column =
    array_min(array(cents.map { case (cid, v) =>
      struct(
        VectorFunctions.l2(col(embCol), typedlit(v.toSeq)).as("d"),
        lit(cid).as("cid"))
    }.toIndexedSeq: _*))

  /** Collect a centroid table to a sorted driver array (k rows by
    * definition) — shared by [[ivfAssignBig]] and the streaming probe
    * path ([[graft.streaming.QueryServe.serveIvf]]) so their
    * tie-breaks cannot drift apart; [[ivfSearchStore]] selects probes
    * via the equivalent declarative orderBy(dist, cid) instead. */
  private[graft] def collectCentroids(centroids: DataFrame, cidCol: String,
                                      cvecCol: String): Array[(Long, Array[Double])] = {
    val cents = centroids
      .select(col(cidCol).cast("long"), col(cvecCol).cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    require(cents.nonEmpty, "centroid table is empty")
    cents
  }

  /** Squared L2 with a loud dimension check — a silent truncated fold
    * would assign a wrong cluster with no error. */
  private[graft] def l2sqStrict(a: Array[Double], b: Array[Double]): Double = {
    require(a.length == b.length,
      s"embedding dim ${a.length} != centroid dim ${b.length}")
    var d = 0.0
    var j = 0
    while (j < a.length) { val t = a(j) - b(j); d += t * t; j += 1 }
    d
  }

  /** [[ivfAssign]] for REAL centroid counts (k from hundreds to tens
    * of thousands): the literal-inline form grows the expression tree
    * — and Janino codegen — linearly with k (megabyte-scale generated
    * code by k≈4096). Here the centroid table is broadcast ONCE as a
    * plain array and the argmin runs as a tight JVM loop per row:
    * still one narrow pass over the corpus, no shuffle, and a
    * CONSTANT-size plan independent of k.
    *
    * This is a documented exception to the prefer-builtins rule: a SQL
    * expression cannot reference a k×dim side input without inlining
    * it as literals, so at real k the UDF-over-broadcast form IS the
    * scale-correct plan. Tie-break matches [[ivfAssign]] exactly:
    * minimum distance, then minimum centroid id (centroids iterate in
    * ascending-cid order and only a strictly smaller distance
    * replaces the incumbent). */
  def ivfAssignBig(corpus: DataFrame, embCol: String, idCol: String,
                   centroids: DataFrame, cidCol: String, cvecCol: String): DataFrame = {
    val cents = collectCentroids(centroids, cidCol, cvecCol)
    val bc = corpus.sparkSession.sparkContext.broadcast(cents)
    // null embedding → null cluster_id; mismatched dims fail loudly via
    // l2sqStrict — the same contract ivfAssign enforces expression-side.
    val assign = udf { (emb: Seq[Double]) =>
      if (emb == null) Option.empty[Long]
      else Some(nearestCentroid(bc.value, emb.toArray)._1)
    }
    corpus.withColumn("cluster_id", assign(col(embCol).cast("array<double>")))
  }

  /** The tight JVM argmin shared by [[ivfAssignBig]] and
    * [[clusterAudit]]'s bigK path: (nearest cid, SQUARED L2 to it).
    * Ascending-cid iteration + strictly-smaller replacement = the
    * same (min d, min cid) tie-break as [[bestCentroid]]. */
  private def nearestCentroid(cs: Array[(Long, Array[Double])],
                              arr: Array[Double]): (Long, Double) = {
    var bestCid = cs(0)._1
    var bestD = Double.MaxValue
    var i = 0
    while (i < cs.length) {
      val d = l2sqStrict(arr, cs(i)._2)
      if (d < bestD) { bestD = d; bestCid = cs(i)._1 }
      i += 1
    }
    (bestCid, bestD)
  }

  /** IVF search against a PARTITIONED store: probe selection runs over
    * the k-row centroid table on the driver (k rows by definition —
    * same boundedness as the assign-time collect), and the store is
    * read with `cluster_id IN (probed)` — a STATIC partition-pruning
    * predicate, so the scan touches only the nprobe cluster
    * directories of an [[graft.sources.IndexStore]] written
    * partitionBy(cluster_id). This is the 100 TB read path: the plan's
    * FileScan carries a PartitionFilters predicate on cluster_id
    * (asserted in AnnSpec; explain with the pruned IN-list captured in
    * PLANS.md), so the scan lists only the probed cluster
    * directories.
    *
    * `adoptStampedNprobe` opts this batch path into the same
    * maintenance-validated probe FLOOR the streaming sink enforces
    * ([[graft.sources.IndexStore.effectiveNprobe]]): when the current
    * version's `_meta.json` carries the budget its recall gate passed
    * at, serve at `max(configured, stamped)` — a batch consumer of a
    * maintained pair must not silently serve below the validated
    * budget (the round-19 gap: only streams adopted the stamp).
    * Default false keeps the exact configured-budget contract; an
    * explicit nprobe ABOVE the stamp always wins either way. */
  def ivfSearchStore(spark: org.apache.spark.sql.SparkSession, path: String,
                     embCol: String, idCol: String,
                     centroids: DataFrame, cidCol: String, cvecCol: String,
                     queryVec: Column, k: Int, nprobe: Int,
                     adoptStampedNprobe: Boolean = false): DataFrame = {
    require(nprobe >= 1, s"nprobe $nprobe must be >= 1")
    val np = flooredNprobe(spark, path, nprobe, adoptStampedNprobe)
    val probed = centroids
      .withColumn("__qdist", VectorFunctions.l2(col(cvecCol), queryVec))
      .orderBy(col("__qdist"), col(cidCol))
      .limit(np)
      .select(col(cidCol).cast("long"))
      .collect().map(_.getLong(0))
    Knn.exact(
      graft.sources.IndexStore.load(spark, path)
        .filter(col("cluster_id").isin(probed: _*)),
      embCol, idCol, queryVec, k)
  }

  /** The batch-side adoption of the stamped probe floor — one tiny
    * meta read when opted in, shared by every `ivfSearchStore*` form;
    * the algebra itself lives in ONE place
    * ([[graft.sources.IndexStore.effectiveNprobe]]), so streaming and
    * batch serving cannot drift. */
  private def flooredNprobe(spark: org.apache.spark.sql.SparkSession,
                            path: String, nprobe: Int,
                            adopt: Boolean): Int =
    if (!adopt) nprobe
    else graft.sources.IndexStore.effectiveNprobe(nprobe,
      // the served path is usually one pinned version DIRECTORY
      // (root/vN — its own `_meta.json` travels with the geometry);
      // the CACHED read (mtime token) makes repeat serving pay one
      // getFileStatus per call instead of an open+read+parse (round
      // 22, closing the r20 advice note). A caller handing the
      // versioned ROOT adopts the current committed version's stamp
      // instead — rare (these call sites pin a version; plain
      // spark.read over a versioned root would union all versions
      // anyway), so it stays uncached.
      graft.sources.IndexStore.pairMetaAtCached(spark, path)
        .orElse(graft.sources.IndexStore.currentPairMeta(spark, path)))

  /** ADAPTIVE-nprobe serving from the partitioned store: probe the
    * FEWEST nearest clusters whose stored occupancies cover
    * `k * candMult` candidates (capped at `maxProbe`; every cluster
    * if the whole index is smaller than the target). A fixed nprobe
    * wastes reads when the nearest cluster already holds 10× k and
    * starves recall when deletes/skew have hollowed it out; sizing
    * the probe set by ACTUAL occupancy adapts per query against a
    * once-per-index-version size table ([[clusterSizes]]). Both
    * driver inputs are bounded by the centroid count by definition
    * (k centroid rows, ≤ k size rows — the same boundedness as
    * [[ivfSearchStore]]'s probe collect).
    * The decision is a pure function of the stored index and the
    * query vector — deterministic, so the v20 oracle replays it in
    * SQL as a cumulative sum over distance-ranked clusters — and the
    * scan it produces is the same static-PartitionFilters shape as
    * [[ivfSearchStore]]. Emits the chosen probe count as `n_probed`:
    * the dial a serving monitor watches for occupancy drift pushing
    * probe fan-out (and latency) up, and the trigger for
    * [[IndexMaintenance]] when it trends toward maxProbe. */
  def ivfSearchStoreAdaptive(spark: org.apache.spark.sql.SparkSession,
                             path: String, embCol: String, idCol: String,
                             centroids: DataFrame, cidCol: String,
                             cvecCol: String, queryVec: Column, k: Int,
                             candMult: Int, maxProbe: Int): DataFrame = {
    // Self-computing variant: pays a full-index occupancy pass PER
    // CALL. Occupancy is a property of the stored index, so serving
    // loops should compute [[clusterSizes]] once per index version
    // and use the sizes overload (the v20 harness entry does).
    ivfSearchStoreAdaptive(spark, path, embCol, idCol, centroids,
      cidCol, cvecCol, queryVec, k, candMult, maxProbe,
      clusterSizes(spark, path))
  }

  /** Per-cluster occupancy of a stored index — the sizes input the
    * adaptive probe decision reads. Compute once per index version;
    * recompute after [[IndexMaintenance.applyDelta]]/compaction
    * (stale sizes mis-size the probe set — wrong cost, never wrong
    * results, since the search inside the probed clusters is exact). */
  def clusterSizes(spark: org.apache.spark.sql.SparkSession,
                   path: String): Map[Long, Long] =
    // cluster_id casts: a partitionBy layout reads the partition
    // column back as int when its values fit
    graft.sources.IndexStore.load(spark, path)
      .groupBy(col("cluster_id").cast("long").as("cluster_id"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  def ivfSearchStoreAdaptive(spark: org.apache.spark.sql.SparkSession,
                             path: String, embCol: String, idCol: String,
                             centroids: DataFrame, cidCol: String,
                             cvecCol: String, queryVec: Column, k: Int,
                             candMult: Int, maxProbe: Int,
                             sizes: Map[Long, Long]): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    require(candMult >= 1, s"candMult $candMult must be >= 1")
    require(maxProbe >= 1, s"maxProbe $maxProbe must be >= 1")
    val ranked = centroids
      .withColumn("__qdist", VectorFunctions.l2(col(cvecCol), queryVec))
      .orderBy(col("__qdist"), col(cidCol))
      .select(col(cidCol).cast("long"))
      .collect().map(_.getLong(0))
    require(ranked.nonEmpty, "centroid table is empty")
    val target = k.toLong * candMult
    val cums = ranked.scanLeft(0L)((acc, cid) =>
      acc + sizes.getOrElse(cid, 0L)).tail
    val wanted = cums.indexWhere(_ >= target) match {
      case -1 => ranked.length
      case i  => i + 1
    }
    val p = math.max(1, math.min(wanted, maxProbe))
    val probed = ranked.take(p)
    Knn.exact(
      graft.sources.IndexStore.load(spark, path)
        .filter(col("cluster_id").isin(probed: _*)),
      embCol, idCol, queryVec, k)
      .withColumn("n_probed", lit(p.toLong))
  }

  /** Metadata-FILTERED IVF serving — the "vector search with a
    * predicate" shape every production vector store exposes (tenant,
    * license, date-range filters), composed so BOTH prunings land in
    * the same scan of the stored index: the driver-collected probe
    * list becomes STATIC PartitionFilters on the `cluster_id` layout,
    * and `predicate` rides next to it as an ordinary data filter the
    * parquet reader pushes down (PushedFilters) when it is a plain
    * column comparison/IN. At 100 TB the scan reads nprobe/k of the
    * directories and, inside them, row groups the predicate's
    * min/max stats admit — neither pruning costs a shuffle.
    *
    * Semantics are PRE-filter: exact top-k among the rows that
    * satisfy `predicate` INSIDE the probed clusters. The filter
    * shrinks the candidate set before ranking — it never truncates a
    * pre-computed top-k the way a post-filter would, so k results
    * come back whenever the probed clusters hold k matching rows. A
    * highly selective predicate at fixed nprobe starves recall; the
    * caller's dial is `nprobe` (widens the probe set, same plan
    * shape). Keep predicates to stored-column comparisons — an
    * expression over the embedding itself would defeat the pushdown
    * and belongs in [[Knn.filtered]] instead. */
  def ivfSearchStoreWhere(spark: org.apache.spark.sql.SparkSession,
                          path: String, embCol: String, idCol: String,
                          centroids: DataFrame, cidCol: String, cvecCol: String,
                          queryVec: Column, k: Int, nprobe: Int,
                          predicate: Column,
                          adoptStampedNprobe: Boolean = false): DataFrame = {
    require(nprobe >= 1, s"nprobe $nprobe must be >= 1")
    val np = flooredNprobe(spark, path, nprobe, adoptStampedNprobe)
    val probed = centroids
      .withColumn("__qdist", VectorFunctions.l2(col(cvecCol), queryVec))
      .orderBy(col("__qdist"), col(cidCol))
      .limit(np)
      .select(col(cidCol).cast("long"))
      .collect().map(_.getLong(0))
    Knn.exact(
      graft.sources.IndexStore.load(spark, path)
        .filter(col("cluster_id").isin(probed: _*) && predicate),
      embCol, idCol, queryVec, k)
  }

  /** Tombstone-aware serving: [[ivfSearchStore]] honoring a DELETE
    * set. A cluster-partitioned index can't be rebuilt per delete;
    * deletes accumulate in a small tombstone table that serving must
    * respect until the next [[graft.operators.IndexMaintenance]]
    * rebuild folds them in. Plan shape: the probe list still prunes
    * the scan to nprobe cluster partitions (static PartitionFilters);
    * the tombstone set — bounded by deletes-since-rebuild, orders of
    * magnitude smaller than the corpus — broadcasts into a LEFT ANTI
    * join BEFORE the exact top-k, so a deleted id can never surface
    * and the cut stays exact over live rows (no k-overfetch hack). If
    * deletes ever outgrow broadcast range the same plan degrades to a
    * shuffled anti join keyed on id — still linear, never quadratic. */
  def ivfSearchStoreExcluding(spark: org.apache.spark.sql.SparkSession,
                              path: String, embCol: String, idCol: String,
                              centroids: DataFrame, cidCol: String,
                              cvecCol: String, queryVec: Column, k: Int,
                              nprobe: Int, tombstones: DataFrame,
                              tombIdCol: String,
                              adoptStampedNprobe: Boolean = false): DataFrame = {
    require(nprobe >= 1, s"nprobe $nprobe must be >= 1")
    val np = flooredNprobe(spark, path, nprobe, adoptStampedNprobe)
    val probed = centroids
      .withColumn("__qdist", VectorFunctions.l2(col(cvecCol), queryVec))
      .orderBy(col("__qdist"), col(cidCol))
      .limit(np)
      .select(col(cidCol).cast("long"))
      .collect().map(_.getLong(0))
    val tomb = tombstones.select(col(tombIdCol).as("__tomb_id")).distinct()
    val live = graft.sources.IndexStore.load(spark, path)
      .filter(col("cluster_id").isin(probed: _*))
      .join(broadcast(tomb), col(idCol) === col("__tomb_id"), "left_anti")
    Knn.exact(live, embCol, idCol, queryVec, k)
  }

  /** Batch IVF search: per-query probe selection over the broadcast
    * centroid table (queries × k rows — both small), then exact top-k
    * INSIDE the probed clusters via the bounded [[TopK]] aggregation:
    * partial heaps map-side, the exchange carries ≤k rows per
    * (partition × query). The candidate join is keyed on cluster_id,
    * so against a cluster-partitioned [[graft.sources.IndexStore]] the
    * scan prunes to the UNION of all probed clusters — per query the
    * work is ~nprobe/k of the corpus, and the corpus never shuffles.
    * Same total order (dist, id) as [[ivfSearch]]. */
  def ivfSearchBatch(assigned: DataFrame, embCol: String, idCol: String,
                     centroids: DataFrame, cidCol: String, cvecCol: String,
                     queries: DataFrame, qidCol: String, qvecCol: String,
                     k: Int, nprobe: Int): DataFrame = {
    require(nprobe >= 1, s"nprobe $nprobe must be >= 1")
    val probes = batchProbes(queries, qidCol, qvecCol,
      centroids, cidCol, cvecCol, nprobe)
    searchWithProbes(assigned, embCol, idCol, probes, qidCol, k)
  }

  /** Per-query probe table: (__qid, __qvec, cluster_id), nprobe rows
    * per query — queries × centroids are both broadcast-small.
    * The query frame's columns are renamed to reserved __q* names up
    * front: if the caller's qidCol/qvecCol collide with a column of
    * the corpus or `centroids` (e.g. both vector columns named
    * "embedding"), an un-renamed join would be ambiguous or silently
    * bind the wrong side. */
  private def batchProbes(queries: DataFrame, qidCol: String, qvecCol: String,
                          centroids: DataFrame, cidCol: String,
                          cvecCol: String, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(qidCol).as("__qid"), col(qvecCol).as("__qvec"))
    val probeW = Window.partitionBy("__qid").orderBy(col("__qdist"), col(cidCol))
    q.crossJoin(broadcast(centroids))
      .withColumn("__qdist", VectorFunctions.l2(col(cvecCol), col("__qvec")))
      .withColumn("__pr", row_number().over(probeW))
      .filter(col("__pr") <= nprobe)
      .select(col("__qid"), col("__qvec"), col(cidCol).as("cluster_id"))
  }

  private def searchWithProbes(assigned: DataFrame, embCol: String,
                               idCol: String, probes: DataFrame,
                               qidCol: String, k: Int): DataFrame =
    assigned.join(broadcast(probes), Seq("cluster_id"))
      .select(col("__qid"),
        VectorFunctions.l2(col(embCol), col("__qvec")).as("__dist"),
        col(idCol).cast("long").as("__id"))
      .groupBy("__qid")
      .agg(TopK.topK(k)(col("__dist"), col("__id")).as("__topk"))
      .select(col("__qid"), posexplode(col("__topk")).as(Seq("__pos", "__entry")))
      .select(col("__qid").as(if (qidCol == idCol) s"${qidCol}_q" else qidCol),
        (col("__pos") + 1).cast("int").as("knn_rank"),
        col("__entry.id").as(idCol), col("__entry.dist").as("dist"))

  /** BATCH serving from the stored cluster-partitioned index — the
    * throughput shape: amortize one index scan across a whole query
    * batch instead of one [[ivfSearchStore]] round-trip per query.
    * The probe table (queries × nprobe rows, driver-bounded) yields
    * the UNION of probed clusters as a STATIC `isin` the reader turns
    * into PartitionFilters — the scan lists only directories some
    * query probes — and inside the scan the broadcast probe join
    * fans each row out to just the queries probing its cluster. The
    * per-(query × partition) partial heaps of the bounded [[TopK]]
    * aggregation keep the exchange at ≤ k rows per query per
    * partition. Same (dist, id) total order as [[ivfSearchBatch]] —
    * which this equals row-for-row on an identically-assigned corpus. */
  def ivfSearchStoreBatch(spark: org.apache.spark.sql.SparkSession,
                          path: String, embCol: String, idCol: String,
                          centroids: DataFrame, cidCol: String,
                          cvecCol: String, queries: DataFrame,
                          qidCol: String, qvecCol: String,
                          k: Int, nprobe: Int,
                          adoptStampedNprobe: Boolean = false): DataFrame = {
    require(nprobe >= 1, s"nprobe $nprobe must be >= 1")
    val np = flooredNprobe(spark, path, nprobe, adoptStampedNprobe)
    val probes = batchProbes(queries, qidCol, qvecCol,
      centroids, cidCol, cvecCol, np)
    val probed = probes.select(col("cluster_id").cast("long")).distinct()
      .collect().map(_.getLong(0)) // bounded by queries × nprobe
    val store = graft.sources.IndexStore.load(spark, path)
      .filter(col("cluster_id").isin(probed: _*))
    searchWithProbes(store, embCol, idCol, probes, qidCol, k)
  }

  /** Two-stage search over an int8-quantized store: candidates by
    * cosine on the DEQUANTIZED codes (the 4×-smaller artifact a
    * 100 TB deployment scans — derived inline here so the query stays
    * self-contained; an [[graft.sources.IndexStore]] would persist
    * (codes, mn, scale) and never read the fp vectors in stage one),
    * then exact-cosine rerank of the top `k·candMult` survivors only.
    * Both stages are TakeOrderedAndProject with (score desc, id)
    * total order, so results are deterministic and oracle-checkable;
    * quantization arithmetic is identical to the s3 fidelity query.
    * Recall is governed by candMult — the exact stage restores order
    * among survivors but cannot resurrect a candidate the quantized
    * metric dropped (measured in AnnSpec against exact kNN). */
  def quantizedSearch(corpus: DataFrame, embCol: String, idCol: String,
                      queryVec: Column, k: Int, candMult: Int = 4): DataFrame = {
    require(k >= 1 && candMult >= 1, "k and candMult must be >= 1")
    val emb = col(embCol).cast("array<double>")
    val cand = corpus
      .withColumn("__mn", array_min(emb))
      .withColumn("__mx", array_max(emb))
      .withColumn("__sc", when(col("__mx") === col("__mn"), lit(1.0))
        .otherwise((col("__mx") - col("__mn")) / 255.0))
      // the stored artifact: int codes + (mn, scale) per vector
      .withColumn("__codes", transform(emb, x =>
        round((x - col("__mn")) / col("__sc"), 0).cast("int")))
      .withColumn("__deq", transform(col("__codes"), c =>
        c.cast("double") * col("__sc") + col("__mn")))
      .withColumn("approx_cos", VectorFunctions.cosine(col("__deq"), queryVec))
      .orderBy(desc("approx_cos"), col(idCol))
      .limit(k * candMult)
    cand
      .withColumn("cos", VectorFunctions.cosine(emb, queryVec))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
      .select(col(idCol), col("approx_cos"), col("cos"))
  }

  /** The int8 artifact [[quantizedSearch]] derives inline, as a
    * write-once table: per-vector affine codes 0..255 plus the (mn,
    * scale) pair needed to dequantize. Stored, this is the 4×-smaller
    * representation a 100 TB deployment scans in stage one — the s3
    * fidelity query measures exactly this round-trip. */
  def quantizedEncode(corpus: DataFrame, embCol: String,
                      idCol: String): DataFrame = {
    val emb = col(embCol).cast("array<double>")
    corpus
      .withColumn("__mn", array_min(emb))
      .withColumn("__mx", array_max(emb))
      .withColumn("__sc", when(col("__mx") === col("__mn"), lit(1.0))
        .otherwise((col("__mx") - col("__mn")) / 255.0))
      .select(col(idCol),
        transform(emb, x =>
          round((x - col("__mn")) / col("__sc"), 0).cast("int")).as("q_codes"),
        col("__mn").as("q_mn"), col("__sc").as("q_scale"))
  }

  /** Two-stage search SERVED from a stored [[quantizedEncode]] table
    * (the s8 treatment applied to the int8 family): stage one scans
    * ONLY the code table — 4× smaller than the fp corpus, and the fp
    * vectors are never read — stage two fetches the k·candMult
    * survivors' exact vectors by broadcast join and reranks. Same
    * dequantize arithmetic, same (score desc, id) total orders and
    * cuts as [[quantizedSearch]], so the two are row-identical by
    * construction and share one oracle. Null codes fail loudly via
    * the same null-first hazard guard as [[pqSearchEncoded]]. */
  def quantizedSearchEncoded(encoded: DataFrame, vectors: DataFrame,
                             embCol: String, idCol: String,
                             queryVec: Column, k: Int,
                             candMult: Int = 4): DataFrame = {
    require(k >= 1 && candMult >= 1, "k and candMult must be >= 1")
    val deq = transform(col("q_codes"), c =>
      c.cast("double") * col("q_scale") + col("q_mn"))
    val survivors = encoded
      .filter(col("q_codes").isNotNull)
      .select(col(idCol),
        VectorFunctions.cosine(deq, queryVec).as("approx_cos"))
      .orderBy(desc("approx_cos"), col(idCol))
      .limit(k * candMult)
    broadcast(survivors)
      .join(vectors.select(col(idCol), col(embCol)), Seq(idCol))
      .withColumn("cos",
        VectorFunctions.cosine(col(embCol).cast("array<double>"), queryVec))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
      .select(col(idCol), col("approx_cos"), col("cos"))
  }

  // ---------------------------------------------------------------------
  // Product quantization (Jégou, Douze, Schmid 2011: "Product
  // Quantization for Nearest Neighbor Search", IEEE TPAMI 33(1)).
  // The vector is split into `m` subvectors; each subspace gets its own
  // codebook; a vector is stored as m small codes (m bytes at 256
  // codes) instead of dim×4 fp32 bytes — at 100 TB this is the
  // difference between scanning the corpus and scanning ~1-3% of it.
  // Search is ADC (asymmetric distance computation): the query
  // precomputes an m×k lookup table of subspace squared distances ONCE,
  // and each stored vector's approximate distance is m table lookups —
  // no decode, no per-vector arithmetic beyond m adds.
  // ---------------------------------------------------------------------

  /** Slice `emb` into subspace `j` of `m` equal parts (1-based slice;
    * caller guarantees dim % m == 0 — enforced at codebook build). */
  private def subvec(emb: Column, j: Int, subDim: Int): Column =
    slice(emb, j * subDim + 1, subDim)

  /** Train per-subspace PQ codebooks with MLlib KMeans (seed-
    * deterministic) — the production codebook path; the harness query
    * uses a deterministic "first vectors" codebook for oracle
    * simplicity, same swap as [[trainCentroids]] → the s2 toy
    * centroids. Output: (sub_idx, code, subvec) — m·kCodes rows,
    * bounded by definition. The m driver-side fits each run one narrow
    * pass over a single projected subvector column; this is index-BUILD
    * cost, amortized over every query the artifact serves. */
  def pqTrainCodebooks(corpus: DataFrame, embCol: String, dim: Int, m: Int,
                       kCodes: Int, seed: Long = 42L,
                       maxIter: Int = 20): DataFrame = {
    require(m >= 1 && dim % m == 0, s"m $m must divide dim $dim")
    require(kCodes >= 1, s"kCodes $kCodes must be >= 1")
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val subDim = dim / m
    val spark = corpus.sparkSession
    import spark.implicits._
    val emb = col(embCol).cast("array<double>")
    (0 until m).flatMap { j =>
      val data = corpus.select(array_to_vector(subvec(emb, j, subDim)).as("__vec"))
      val model = new KMeans().setK(kCodes).setSeed(seed + j).setMaxIter(maxIter)
        .setFeaturesCol("__vec").fit(data)
      model.clusterCenters.zipWithIndex.map { case (c, i) =>
        (j, i.toLong, c.toArray)
      }
    }.toDF("sub_idx", "code", "subvec")
  }

  /** Collect a codebook table into per-subspace arrays indexed by code
    * (codes must be exactly 0..kCodes-1 per subspace — checked loudly:
    * a gap would silently shift every later codeword). */
  private def collectCodebooks(codebooks: DataFrame): Array[Array[Array[Double]]] = {
    val rows = codebooks
      .select(col("sub_idx").cast("int"), col("code").cast("long"),
        col("subvec").cast("array<double>"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray))
    require(rows.nonEmpty, "codebook table is empty")
    val m = rows.map(_._1).max + 1
    (0 until m).toArray.map { j =>
      val sub = rows.filter(_._1 == j).sortBy(_._2)
      require(sub.map(_._2).sameElements(sub.indices.map(_.toLong)),
        s"subspace $j codes must be exactly 0..${sub.length - 1}")
      sub.map(_._3)
    }
  }

  /** PQ-encode the corpus: adds `pq_codes` (array<int>, one code per
    * subspace — THE stored artifact, m small ints instead of dim
    * floats). Codebooks inline as literal (dist, code) structs with
    * array_min argmin per subspace — [[ivfAssign]]'s deterministic
    * tie-break (min distance, then min code), one narrow pass, no
    * shuffle, fully codegen'd. Plan size grows with m·kCodes·subDim
    * literals: fine for oracle/toy codebooks; at real sizes (256 codes
    * × 16+ subspaces) use [[pqEncodeBig]] — same Janino-blowup boundary
    * as [[ivfAssign]] → [[ivfAssignBig]]. Null embeddings → null codes
    * (the [[ivfAssign]] contract). */
  def pqEncode(corpus: DataFrame, embCol: String,
               codebooks: DataFrame): DataFrame = {
    val cbs = collectCodebooks(codebooks)
    val subDim = cbs(0)(0).length
    val emb = col(embCol).cast("array<double>")
    val codeCols = cbs.indices.map { j =>
      val structs = array(cbs(j).zipWithIndex.map { case (cw, c) =>
        struct(
          VectorFunctions.l2Sq(subvec(emb, j, subDim), typedlit(cw.toSeq)).as("d"),
          lit(c).as("c"))
      }.toIndexedSeq: _*)
      // null subspace distance (dim mismatch / null element) sorts
      // FIRST in struct order — unguarded array_min would assign code
      // 0 silently where pqEncodeBig fails loudly (l2sqStrict). Same
      // guard, same contract, as ivfAssign.
      val best = array_min(structs)
      when(best.getField("d").isNull,
        raise_error(lit(s"pqEncode: null subspace-$j distance " +
          "(dim mismatch or null element)")))
        .otherwise(best.getField("c"))
    }
    // exact-dim check: an OVER-length embedding slices clean subvectors
    // for every subspace (no null distance to trip the guard above) yet
    // null-poisons the fp rerank downstream — reject it here, where the
    // artifact is built, not k results later
    corpus.withColumn("pq_codes",
      when(col(embCol).isNull, lit(null).cast("array<int>"))
        .when(size(emb) =!= cbs.length * subDim,
          raise_error(concat(lit(s"pqEncode: embedding dim "),
            size(emb).cast("string"), lit(s" != ${cbs.length * subDim}"))))
        .otherwise(array(codeCols: _*)))
  }

  /** [[pqEncode]] at REAL codebook sizes: codebooks broadcast once as
    * plain arrays, the per-subspace argmin a tight JVM loop — constant
    * plan size independent of m·kCodes (the [[ivfAssignBig]] exception,
    * same justification). Identical codes by construction: minimum
    * distance, then minimum code. */
  def pqEncodeBig(corpus: DataFrame, embCol: String,
                  codebooks: DataFrame): DataFrame = {
    val cbs = collectCodebooks(codebooks)
    val bc = corpus.sparkSession.sparkContext.broadcast(cbs)
    val subDim = cbs(0)(0).length
    val enc = udf { (emb: Seq[Double]) =>
      if (emb == null) Option.empty[Array[Int]]
      else {
        val codebooksV = bc.value
        require(emb.length == codebooksV.length * subDim,
          s"pqEncodeBig: embedding dim ${emb.length} != ${codebooksV.length * subDim}")
        Some(codebooksV.indices.toArray.map { j =>
          val sub = emb.slice(j * subDim, (j + 1) * subDim).toArray
          val cws = codebooksV(j)
          var best = 0
          var bestD = Double.MaxValue
          var c = 0
          while (c < cws.length) {
            val d = l2sqStrict(sub, cws(c))
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          best
        })
      }
    }
    corpus.withColumn("pq_codes", enc(col(embCol).cast("array<double>")))
  }

  /** Two-stage PQ search: ADC candidates from the m-byte codes, exact
    * rerank of the top `k·candMult` survivors. The query-side LUT
    * (subspace squared distance to every codeword — m·kCodes doubles)
    * inlines as literal arrays, so the ADC score is m element_at
    * lookups + adds per row: narrow, codegen'd, and the ONLY thing
    * stage one reads is `pq_codes` (at 100 TB: a ~1% scan). Codes are
    * derived inline here so the query stays self-contained — a real
    * deployment persists `pq_codes` at index-build time ([[pqEncode]]'s
    * artifact) and stage one never touches the fp vectors. Both cuts
    * are total-ordered ((dist asc, id) — [[quantizedSearch]]'s
    * contract), so the result is deterministic and oracle-checkable.
    * Recall is governed by candMult and codebook quality (measured in
    * AnnSpec against exact kNN, the v9/v10 pattern). */
  def pqSearch(corpus: DataFrame, embCol: String, idCol: String,
               codebooks: DataFrame, queryVec: Array[Double],
               k: Int, candMult: Int = 4): DataFrame = {
    require(k >= 1 && candMult >= 1, "k and candMult must be >= 1")
    val cbs = collectCodebooks(codebooks)
    val subDim = cbs(0)(0).length
    require(queryVec.length == cbs.length * subDim,
      s"query dim ${queryVec.length} != ${cbs.length}·$subDim")
    val luts = cbs.indices.map { j =>
      val qSub = queryVec.slice(j * subDim, (j + 1) * subDim)
      typedlit(cbs(j).map(cw => l2sqStrict(qSub, cw)).toSeq)
    }
    // j ascending, left-assoc adds — the oracle mirrors this exact fold
    val adc = cbs.indices
      .map(j => element_at(luts(j), element_at(col("pq_codes"), j + 1) + 1))
      .reduce(_ + _)
    val emb = col(embCol).cast("array<double>")
    // null embeddings carry null pq_codes (pqEncode's contract) → null
    // approx_dist, which Spark's ASC default sorts FIRST — they would
    // displace true neighbors from the candidate cut. A null vector is
    // never a neighbor: drop before the cut.
    // pqEncodeBig, not pqEncode (round 21): the expression form builds
    // m·kCodes struct l2Sq subtrees per row — too wide for whole-stage
    // codegen, so it evaluates interpreted with per-row slice
    // allocations. Measured at sf0.1 (2000 rows, m=4, kCodes=16):
    // 2.76 s expression vs 0.11 s tight-loop — identical codes by
    // AnnSpec's pqEncode≡pqEncodeBig assertion, identical null/dim
    // contracts (null -> null codes, mismatch fails loudly).
    val cand = pqEncodeBig(corpus, embCol, codebooks)
      .filter(col("pq_codes").isNotNull)
      .withColumn("approx_dist", sqrt(adc))
      .orderBy(col("approx_dist"), col(idCol))
      .limit(k * candMult)
    // a null rerank distance (possible only via artifact inconsistency;
    // encode-side dim checks cover the inline path) would sort first
    // under ASC — fail loudly instead of returning a poisoned top-k
    cand
      .withColumn("dist", rerankDist(emb, queryVec, col(idCol), "pqSearch"))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
      .select(col(idCol), col("approx_dist"), col("dist"))
  }

  /** Exact rerank distance with a loud null guard shared by
    * [[pqSearch]] and [[pqSearchEncoded]]. */
  private def rerankDist(emb: Column, queryVec: Array[Double],
                         id: Column, who: String): Column = {
    val d = VectorFunctions.l2(emb, typedlit(queryVec.toSeq))
    when(d.isNull, raise_error(concat(
      lit(s"$who: null rerank distance (dim mismatch or null vector) for id "),
      id.cast("string")))).otherwise(d)
  }

  /** [[pqSearch]] against a PRE-ENCODED code table — the serving path
    * the scaladoc above promises. `encoded` is [[pqEncode]]/
    * [[pqEncodeBig]] output persisted at index-build time (idCol +
    * `pq_codes`); `vectors` holds the full-precision column for the
    * rerank. Stage one's scan touches ONLY (id, pq_codes) — column
    * pruning reaches the parquet reader because the fp vectors live
    * behind a separate scan — and the rerank fetches ≤ k·candMult
    * vectors through a broadcast semi-lookup, never a corpus pass.
    * Encode cost (the dominant term when [[pqSearch]] derives codes
    * inline — measured 20×: encode ≈ 90% of the query) is paid once
    * per index build instead of once per query. Same cuts, same
    * tie-breaks, row-identical to [[pqSearch]] (AnnSpec asserts). */
  def pqSearchEncoded(encoded: DataFrame, vectors: DataFrame,
                      embCol: String, idCol: String,
                      codebooks: DataFrame, queryVec: Array[Double],
                      k: Int, candMult: Int = 4): DataFrame = {
    require(k >= 1 && candMult >= 1, "k and candMult must be >= 1")
    val cbs = collectCodebooks(codebooks)
    val subDim = cbs(0)(0).length
    require(queryVec.length == cbs.length * subDim,
      s"query dim ${queryVec.length} != ${cbs.length}·$subDim")
    val luts = cbs.indices.map { j =>
      val qSub = queryVec.slice(j * subDim, (j + 1) * subDim)
      typedlit(cbs(j).map(cw => l2sqStrict(qSub, cw)).toSeq)
    }
    val adc = cbs.indices
      .map(j => element_at(luts(j), element_at(col("pq_codes"), j + 1) + 1))
      .reduce(_ + _)
    val survivors = encoded
      .filter(col("pq_codes").isNotNull) // same null-first hazard as pqSearch
      .select(col(idCol), sqrt(adc).as("approx_dist"))
      .orderBy(col("approx_dist"), col(idCol))
      .limit(k * candMult)
    broadcast(survivors)
      .join(vectors.select(col(idCol), col(embCol)), Seq(idCol))
      .withColumn("dist", rerankDist(col(embCol).cast("array<double>"),
        queryVec, col(idCol), "pqSearchEncoded"))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
      .select(col(idCol), col("approx_dist"), col("dist"))
  }

  /** IVF+PQ (the Jégou et al. IVFADC composition, the architecture
    * behind FAISS's IndexIVFPQ): coarse quantizer prunes the corpus to
    * `nprobe` clusters, product quantizer scores the survivors by ADC,
    * exact rerank restores true order among the top k·candMult. At
    * 100 TB the two stages multiply: the scan reads only the probed
    * cluster partitions (partition pruning when the assigned table is
    * stored partitionBy(cluster_id) — [[ivfSearchStore]]'s layout),
    * and within them only the m-byte codes. `assigned` is
    * [[ivfAssign]]/[[ivfAssignBig]] output; probe selection is the
    * [[ivfSearch]] rule (L2 to centroid, min-cid tie-break), so the
    * whole composition stays deterministic and oracle-checkable. */
  def ivfPqSearch(assigned: DataFrame, embCol: String, idCol: String,
                  centroids: DataFrame, cidCol: String, cvecCol: String,
                  codebooks: DataFrame, queryVec: Array[Double],
                  k: Int, nprobe: Int, candMult: Int = 4): DataFrame = {
    // nprobe = 0 would return an empty result silently — loud, like
    // every other parameter guard in this family
    require(nprobe >= 1, s"nprobe $nprobe must be >= 1")
    val probed = centroids
      .withColumn("__qdist",
        VectorFunctions.l2(col(cvecCol), typedlit(queryVec.toSeq)))
      .orderBy(col("__qdist"), col(cidCol))
      .limit(nprobe)
      .select(col(cidCol).as("cluster_id"))
    pqSearch(
      assigned.join(broadcast(probed), Seq("cluster_id"), "left_semi"),
      embCol, idCol, codebooks, queryVec, k, candMult)
  }

  /** [[ivfPqSearch]] against a PRE-ENCODED, cluster-keyed code table —
    * the IVFADC serving path. `encoded` is index-build output carrying
    * (cluster_id, idCol, pq_codes), ideally WRITTEN partitionBy
    * (cluster_id); the probe list is collected driver-side (bounded by
    * construction: nprobe rows of a k-row centroid table — the
    * [[ivfSearchStore]] pattern) so the filter is a STATIC
    * PartitionFilters predicate at the parquet reader, listing only
    * the probed cluster directories (AnnSpec asserts via the scan's
    * numPartitions metric); within them the scan touches only the
    * m-byte codes. The two index-time prunings multiply exactly as in
    * [[ivfPqSearch]], but BOTH the coarse assignment and the PQ encode
    * are paid once at build time — per query, this path reads codes in
    * nprobe partitions and reranks ≤ k·candMult vectors. Same probe
    * rule, same cuts, same tie-breaks: row-identical to
    * [[ivfPqSearch]] (AnnSpec asserts). */
  def ivfPqSearchEncoded(encoded: DataFrame, vectors: DataFrame,
                         embCol: String, idCol: String,
                         centroids: DataFrame, cidCol: String, cvecCol: String,
                         codebooks: DataFrame, queryVec: Array[Double],
                         k: Int, nprobe: Int, candMult: Int = 4): DataFrame = {
    require(nprobe >= 1, s"nprobe $nprobe must be >= 1")
    val probed = centroids
      .withColumn("__qdist",
        VectorFunctions.l2(col(cvecCol), typedlit(queryVec.toSeq)))
      .orderBy(col("__qdist"), col(cidCol))
      .limit(nprobe)
      .select(col(cidCol).cast("long"))
      .collect().map(_.getLong(0))
    pqSearchEncoded(
      encoded.filter(col("cluster_id").isin(probed: _*)),
      vectors, embCol, idCol, codebooks, queryVec, k, candMult)
  }

  /** IVF search: probe the `nprobe` centroids nearest to the query,
    * exact top-k inside those clusters only. `assigned` is the output
    * of [[ivfAssign]] (ideally written partitioned by cluster_id). */
  def ivfSearch(assigned: DataFrame, embCol: String, idCol: String,
                centroids: DataFrame, cidCol: String, cvecCol: String,
                queryVec: Column, k: Int, nprobe: Int): DataFrame = {
    require(nprobe >= 1, s"nprobe $nprobe must be >= 1")
    val probed = centroids
      .withColumn("__qdist", VectorFunctions.l2(col(cvecCol), queryVec))
      .orderBy(col("__qdist"), col(cidCol))
      .limit(nprobe)
      .select(col(cidCol).as("cluster_id"))
    // nprobe cluster ids → broadcast semi-join = partition pruning when
    // the assigned table is stored partitioned by cluster_id.
    Knn.exact(
      assigned.join(broadcast(probed), Seq("cluster_id"), "left_semi"),
      embCol, idCol, queryVec, k)
  }

  /** Embedding-space drift between two corpus snapshots — the vector
    * twin of [[Curation.distributionDrift]] (t22). Both snapshots are
    * assigned to the SAME fixed centroid set (the live index's — a
    * narrow argmin map, no shuffle, no join), and the drift is the JS
    * divergence between the two cluster-MASS distributions: an
    * embedding-model update, a topical shift in the crawl, or a feed
    * gone rogue all show up as probability mass moving between
    * regions of the vector space, per-cluster attributable. This is
    * the signal that tells an index operator "re-train the centroids"
    * (IVF recall decays when the mass no longer matches the
    * partitioning) before v9/v11's recall eval says it after the
    * fact.
    *
    * Scale shape: two narrow assignment maps over the snapshots, then
    * [[Curation.keyedDrift]] on `cluster_id` — the exchange carries k
    * counts per side, never vectors. Null embeddings are excluded
    * (they have no position in the space); the empty-side guard is
    * keyedDrift's, loud.
    *
    * At real centroid counts pass `bigK = true` — the [[ivfAssignBig]]
    * form (broadcast centroids + the shared JVM argmin, constant plan
    * size) instead of the literal-inline argmin whose generated code
    * grows linearly with k. Same tie-break either way, so the masses —
    * and the JS — are identical. [[IndexMaintenance.maintain]] feeds
    * this the index's full effective-centroid set, so it always takes
    * the bigK path. */
  def embeddingDrift(a: DataFrame, b: DataFrame, embCol: String,
                     idCol: String, centroids: DataFrame,
                     cidCol: String, cvecCol: String,
                     bigK: Boolean = false): DataFrame = {
    def masses(df: DataFrame) = {
      val assigned =
        if (bigK) ivfAssignBig(df, embCol, idCol, centroids, cidCol, cvecCol)
        else ivfAssign(df, embCol, idCol, centroids, cidCol, cvecCol)
      assigned.filter(col("cluster_id").isNotNull).select(col("cluster_id"))
    }
    Curation.keyedDrift(masses(a), masses(b), "cluster_id",
      opName = "embeddingDrift")
  }

  /** Per-cluster health audit of an IVF index: for every centroid, the
    * member count, the mean member→centroid L2 distance (tightness),
    * the distance to the nearest OTHER centroid (separation), and the
    * ratio min_inter / mean_intra — a per-cluster Dunn-style index.
    * This is the report an index maintainer reads before trusting a
    * partitioning: separation ≪ 1 means members sit farther from their
    * own centroid than the next centroid does (probe spill, bad
    * recall at low nprobe — retrain); n = 0 means a dead partition
    * (wasted probe budget). Complements [[embeddingDrift]] (mass
    * moved) and [[graft.streaming.IndexMaintenance]] (recall gate)
    * with the geometric WHY.
    *
    * Contract: empty clusters ARE reported (n = 0, null mean_intra /
    * separation); a singleton cluster whose only member is the
    * centroid itself has mean_intra = 0 → null separation (not ∞).
    * Null-embedding rows are excluded, matching [[ivfAssign]]'s
    * null-cluster contract.
    *
    * Scale shape: one narrow assignment scan over the corpus (the
    * [[ivfAssign]] literal argmin — no shuffle, no join), a k-group
    * aggregate, and a k×k separation matrix computed on the driver
    * from the already-collected centroid table and joined back as a
    * broadcast k-row frame. At real k pass `bigK = true` — the
    * [[ivfAssignBig]] form (broadcast centroids + the shared JVM
    * argmin, constant plan size) — the same s2 → s4 swap; the audit
    * cost at 100 TB is the assignment pass an index build pays
    * anyway. */
  def clusterAudit(corpus: DataFrame, embCol: String, idCol: String,
                   centroids: DataFrame, cidCol: String,
                   cvecCol: String, bigK: Boolean = false): DataFrame = {
    val cents = collectCentroids(centroids, cidCol, cvecCol)
    require(cents.length >= 2,
      s"clusterAudit needs >= 2 centroids, got ${cents.length}")
    // k×k nearest-other-centroid distances: k rows by definition, so
    // the driver loop is bounded and the result broadcasts.
    val spark = corpus.sparkSession
    import spark.implicits._
    val interDf = cents.map { case (cid, v) =>
      (cid, cents.iterator.filter(_._1 != cid)
        .map(c => math.sqrt(l2sqStrict(v, c._2))).min)
    }.toSeq.toDF("cluster_id", "__min_inter")
    // The argmin already computed the member→centroid distance, and
    // against the SAME collected snapshot the assignment used — reuse
    // it instead of re-joining a fresh centroid scan (which could
    // disagree with the snapshot under a nondeterministic centroid
    // frame). Null-distance guard matches ivfAssign's contract.
    // bigK = the ivfAssignBig form (broadcast centroids + shared JVM
    // argmin): constant plan size at real k, where inlining k literal
    // structs blows up Janino — same s2 → s4 swap, same tie-break.
    val withD =
      if (bigK) {
        val bc = spark.sparkContext.broadcast(cents)
        val assign = udf { (emb: Seq[Double]) =>
          val (cid, d2) = nearestCentroid(bc.value, emb.toArray)
          (cid, math.sqrt(d2))
        }
        corpus.filter(col(embCol).isNotNull)
          .select(assign(col(embCol).cast("array<double>")).as("__a"))
          .select(col("__a._1").as("cluster_id"), col("__a._2").as("__d"))
      } else {
        val best = bestCentroid(cents, embCol)
        corpus.filter(col(embCol).isNotNull)
          .select(
            when(best.getField("d").isNull,
              raise_error(concat(
                lit("clusterAudit: null distance (dim mismatch or null element) for id "),
                col(idCol).cast("string"))))
              .otherwise(best.getField("cid")).as("cluster_id"),
            best.getField("d").as("__d"))
      }
    val intra = withD
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("__n"), avg("__d").as("__mi"))
    // interDf is the k-row outer side of the left join, so the
    // broadcast goes on the ≤k-row aggregate (the preserved side of a
    // left-outer join cannot be broadcast).
    interDf.join(broadcast(intra), Seq("cluster_id"), "left")
      .select(
        col("cluster_id"),
        coalesce(col("__n"), lit(0L)).as("n"),
        round(col("__mi"), 6).as("mean_intra"),
        round(col("__min_inter"), 6).as("min_inter"),
        when(col("__mi").isNull || col("__mi") === 0,
            lit(null).cast("double"))
          .otherwise(round(col("__min_inter") / col("__mi"), 6))
          .as("separation"))
  }

  /** Rebalance oversized clusters — the remediation for what
    * [[clusterAudit]] flags (fat cells) and for the residual serving
    * hazard the round-15 skew probe named: a fat cluster makes every
    * query probing it pay a bigger stage-one scan, and at the extreme
    * its directory becomes one hard-to-split scan unit. Every cluster
    * with more than `maxRows` members has its members re-clustered
    * (per-cluster [[trainCentroids]] into ceil(1.25·n/maxRows) ≥ 2
    * sub-centroids — 25% headroom so ~80% average occupancy, making
    * single-pass convergence the norm — seed-deterministic) and the
    * centroid table is
    * rewritten with the fat centroid RETIRED and its sub-centroids
    * appended under fresh ids (max existing cid + running offset) —
    * untouched clusters keep their ids and their rows are never
    * reassigned. Cost ∝ fat clusters when `assigned` is a
    * cluster-partitioned store read (each per-cluster filter prunes
    * to one directory — the upsertPartitioned philosophy applied to
    * geometry); over an UNPARTITIONED frame each fat cluster's filter
    * re-scans the input, so localCheckpoint such a frame first when f
    * is large. The f sub-trainings run CONCURRENTLY through a bounded
    * driver pool (`trainParallelism`) because their serial cost is
    * per-fit scheduler latency, not data (measured: 151 fat cells =
    * 249 s serial vs 16 s to execute the whole split plan —
    * PLANS.md round 16); results are identical to the serial order by
    * construction (seed-deterministic fits, sorted-parent id
    * assignment). Null-cluster rows (null embeddings) pass through
    * untouched.
    *
    * Semantics, stated precisely: the split REFINES the old partition
    * — each fat cluster's members are re-divided among that cluster's
    * own sub-centroids (local argmin), not globally reassigned, so a
    * boundary member stays inside its old Voronoi cell's territory.
    * That is the same approximation class as IVF itself; when a full
    * rebuild is affordable, `ivfAssignBig(corpus, newCents)` is the
    * global alternative. KMeans does not promise balanced cells, so
    * even with the headroom a pass can leave a sub-cluster above
    * `maxRows` on skewed-density data (duplicate-point degeneracy
    * cannot split at all) — [[clusterAudit]] is the loop condition.
    *
    * Returns (reassigned index, new centroid table): commit the pair
    * atomically with
    * [[graft.sources.IndexStore.writeVersionedWithCentroids]] — a
    * geometry change is exactly the retrain-flip case the pair store
    * exists for. `trainSampleMax` caps the rows each sub-FIT scans
    * (geometry from a seed-deterministic sample, assignment still over
    * every member) — the 100 TB knob for fat cells with billions of
    * rows; 0 (default) fits on all members, bit-identical to the
    * pre-knob behavior. */
  def splitFatClusters(assigned: DataFrame, embCol: String, idCol: String,
                       centroids: DataFrame, cidCol: String,
                       cvecCol: String, maxRows: Long, seed: Long = 42L,
                       trainParallelism: Int = 8,
                       trainSampleMax: Long = 0)
      : (DataFrame, DataFrame) = {
    require(maxRows >= 1, s"maxRows $maxRows must be >= 1")
    require(trainParallelism >= 1,
      s"trainParallelism $trainParallelism must be >= 1")
    require(trainSampleMax >= 0,
      s"trainSampleMax $trainSampleMax must be >= 0 (0 = train on all)")
    require(assigned.columns.contains("cluster_id"),
      "splitFatClusters needs a cluster-assigned index (cluster_id column)")
    val cents = collectCentroids(centroids, cidCol, cvecCol)
    val fat = assigned.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("cluster_id").isNotNull && col("__n") > maxRows)
      .select(col("cluster_id").cast("long"), col("__n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))) // ≤ k rows
      .sortBy(_._1)
    if (fat.isEmpty) return (assigned, centroids)
    val spark = assigned.sparkSession
    import spark.implicits._
    // The f sub-trainings are independent read-only Spark jobs whose
    // serial cost is SCHEDULER LATENCY, not data volume: the round-16
    // probe measured 151 serial fits at ~1.65 s each (249 s total)
    // while EXECUTING the whole 152-branch result plan took 16 s. Run
    // the fits through a bounded driver pool — Spark schedules
    // concurrent jobs from multiple threads natively, each fit is
    // seed-deterministic, and the fold below assigns fresh ids in
    // sorted parent order, so the result is bit-identical to the
    // serial loop's. 25% headroom on kSub: ceil(n/maxRows) sub-cells
    // would need PERFECTLY balanced KMeans cells to land under maxRows
    // (average occupancy = the limit itself); targeting ~80% average
    // occupancy makes single-pass convergence the norm instead of the
    // lucky case, at the price of slightly smaller cells.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(fat.length, trainParallelism))
    // every fit tags its jobs with one group id so a failure can cancel
    // the SIBLING fits' in-flight cluster work, not just their driver
    // threads — a bare thread interrupt only unblocks the local await
    // while the submitted Spark jobs keep running all their tasks
    val jobGroup =
      s"graft-split-fat-${java.util.UUID.randomUUID().toString.take(8)}"
    val trained: Map[Long, IndexedSeq[(Long, Array[Double])]] =
      try {
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutor(pool)
        scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(fat.toSeq.map { case (cid, n) =>
            scala.concurrent.Future {
              spark.sparkContext.setJobGroup(jobGroup,
                "splitFatClusters sub-training", interruptOnCancel = true)
              val members = assigned.filter(col("cluster_id") === cid)
              // trainSampleMax bounds what each FIT scans: a fat cell
              // at production scale can hold billions of rows, and
              // KMeans passes over its train set per iteration —
              // sub-cell GEOMETRY comes from a seed-deterministic
              // uniform sample, while every member is still assigned
              // (the fold below) and the caller's recall gate
              // (rebalance) still validates the FULL split index, so
              // a sample too thin to produce servable sub-cells is
              // vetoed, never committed. 0 = fit on all members (the
              // default — bit-identical to the pre-knob behavior).
              val trainSet =
                if (trainSampleMax > 0 && n > trainSampleMax)
                  members.sample(withReplacement = false,
                    trainSampleMax.toDouble / n, seed)
                else members
              val kSub = math.max(2,
                math.ceil(n.toDouble * 1.25 / maxRows).toInt)
              cid -> collectCentroids(
                trainCentroids(trainSet, embCol, kSub, seed),
                "cid", "cvec").toIndexedSeq
            }
          }), scala.concurrent.duration.Duration.Inf).toMap
      } catch {
        // a failed sub-training must CANCEL the queued and running
        // sibling fits, not let them keep burning cluster resources
        // after the caller has already seen the exception: the group
        // cancel kills their submitted Spark jobs (tasks interrupted),
        // shutdownNow drains the queue and unblocks the pool threads
        case t: Throwable =>
          spark.sparkContext.cancelJobGroup(jobGroup)
          pool.shutdownNow()
          throw t
      } finally pool.shutdown()
    var nextCid = cents.map(_._1).max + 1
    val fatIds = fat.map(_._1)
    var newCents = cents.toVector.filterNot { case (c, _) => fatIds.contains(c) }
    var reassigned = Vector.empty[DataFrame]
    fat.foreach { case (cid, _) =>
      // trained cids are 0-based; shift to globally fresh ids
      val sub = trained(cid).map { case (c, v) => (nextCid + c, v) }
      nextCid += trained(cid).length
      newCents ++= sub
      val subDf = sub.map { case (c, v) => (c, v.toSeq) }
        .toDF("cid", "cvec")
      reassigned :+= ivfAssignBig(
        assigned.filter(col("cluster_id") === cid).drop("cluster_id"),
        embCol, idCol, subDf, "cid", "cvec")
    }
    val untouched = assigned.filter(
      col("cluster_id").isNull || !col("cluster_id").isin(fatIds: _*))
    val newAssigned = (untouched +: reassigned).reduce(_ unionByName _)
    val newCentDf = newCents.map { case (c, v) => (c, v.toSeq) }
      .toDF(cidCol, cvecCol)
    (newAssigned, newCentDf)
  }

  /** [[splitFatClusters]]'s INVERSE — fold sliver cells back into
    * their neighbors. Repeated split-based rebalancing (and corpus
    * deletions/drift) only ever GROWS the cell count: the round-17
    * convergence probe went 256 → ~1,400 cells, and at a fixed
    * `nprobe` each probe then covers a smaller corpus fraction, so
    * recall sags (measured 1.0 → 0.87–0.90) while the centroid
    * broadcast, the per-query probe ranking, and — on a
    * partitionBy(cluster_id) store — the FILE count all grow. Thin
    * cells are pure overhead at 100 TB: a cell below `minRows` adds a
    * directory of sliver files to every listing and a centroid to
    * every argmin while contributing almost no candidates.
    *
    * Every cluster with FEWER than `minRows` members (including
    * zero-member cells whose centroid lingers in the table after
    * deletions) is retired: its members are reassigned to the nearest
    * SURVIVING centroid (global argmin over the survivors — the same
    * [[ivfAssignBig]] rule assignment uses, so the merged index is
    * exactly what a fresh assign against the survivor table would
    * produce for those rows) and its centroid is dropped. Survivors
    * keep their ids AND their members — probe lists over untouched
    * cells are stable, and only thin-cell mass moves, so cost ∝ thin
    * mass (< thin-count · minRows by definition): over a
    * cluster-partitioned store read, the thin-member filter prunes to
    * the thin directories. Null-cluster rows pass through untouched.
    *
    * Merging ADDS mass to survivors, so it can push one past a fat
    * threshold — the fat and thin axes are separate audits;
    * [[graft.operators.IndexMaintenance.compact]] gates this rewrite
    * on the same recall floor as rebalance (moving a member under a
    * farther centroid can genuinely lower its retrieval rank), and
    * running compact AFTER a rebalance loop restores the cell-count /
    * nprobe balance the loop's splitting disturbed.
    *
    * Refuses loudly when NO cell reaches `minRows` (there is nothing
    * to merge into — that is a retrain case, not a merge case).
    * Returns (reassigned index, survivor centroid table) for one
    * atomic [[graft.sources.IndexStore.writeVersionedWithCentroids]]
    * pair commit. */
  def mergeThinClusters(assigned: DataFrame, embCol: String, idCol: String,
                        centroids: DataFrame, cidCol: String,
                        cvecCol: String, minRows: Long)
      : (DataFrame, DataFrame) = {
    require(assigned.columns.contains("cluster_id"),
      "mergeThinClusters needs a cluster-assigned index (cluster_id column)")
    // counts-only occupancy histogram — ≤ k rows cross the driver; the
    // centroid table (not the histogram) drives thinness so EMPTY
    // cells, which the groupBy never sees, are retired too
    mergeThinClustersWithOcc(assigned, embCol, idCol, centroids, cidCol,
      cvecCol, minRows,
      assigned.filter(col("cluster_id").isNotNull)
        .groupBy(col("cluster_id").cast("long").as("cluster_id"))
        .agg(count(lit(1)).as("__n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }

  /** [[mergeThinClusters]] with the occupancy histogram supplied by a
    * caller that already computed it (IndexMaintenance.compact's
    * detect pass) — one full-index aggregate instead of two. */
  private[operators] def mergeThinClustersWithOcc(assigned: DataFrame,
      embCol: String, idCol: String, centroids: DataFrame, cidCol: String,
      cvecCol: String, minRows: Long, occ: Map[Long, Long])
      : (DataFrame, DataFrame) = {
    require(minRows >= 1, s"minRows $minRows must be >= 1")
    require(assigned.columns.contains("cluster_id"),
      "mergeThinClusters needs a cluster-assigned index (cluster_id column)")
    val cents = collectCentroids(centroids, cidCol, cvecCol)
    val thinIds = cents.map(_._1)
      .filter(occ.getOrElse(_, 0L) < minRows).sorted
    if (thinIds.isEmpty) return (assigned, centroids)
    val survivors = cents.filterNot { case (c, _) => thinIds.contains(c) }
    require(survivors.nonEmpty,
      s"mergeThinClusters: every cell is below minRows $minRows — " +
        "nothing to merge into; lower minRows or retrain the index")
    val spark = assigned.sparkSession
    import spark.implicits._
    val survivorDf = survivors.toSeq.map { case (c, v) => (c, v.toSeq) }
      .toDF("cid", "cvec")
    // only thin cells with MEMBERS need reassignment; a thin-id IN
    // filter on a partitioned store prunes to the thin directories
    val movingIds = thinIds.filter(occ.getOrElse(_, 0L) > 0L)
    val untouched = assigned.filter(
      col("cluster_id").isNull || !col("cluster_id").isin(thinIds: _*))
    val newAssigned =
      if (movingIds.isEmpty) untouched
      else untouched.unionByName(ivfAssignBig(
        assigned.filter(col("cluster_id").isin(movingIds: _*))
          .drop("cluster_id"),
        embCol, idCol, survivorDf, "cid", "cvec"))
    (newAssigned, survivorDf.toDF(cidCol, cvecCol))
  }

  // ---------------------------------------------------------------------
  // Binary (sign) quantization — 1 bit per dimension, Hamming ranking.
  // The coarsest point on the compression ladder the engine already
  // climbs (int8 4×, PQ 16-32×): sign-bit packing is 32× smaller than
  // fp32, and candidate ranking degrades to XOR + popcount — the
  // cheapest per-vector arithmetic any stage-one scan can do. The
  // standard two-stage recipe (rank by Hamming on the packed codes,
  // exact rerank of the bounded survivor set) follows the binary-
  // hashing literature (Charikar STOC'02 sign-random-projection;
  // FAISS's IndexBinaryFlat serving shape). Here the projection is the
  // identity — the sign pattern of the raw embedding — which keeps the
  // whole path exactly SQL-replayable.
  // ---------------------------------------------------------------------

  /** Pack the sign pattern of `embCol` (bit b of word w set ⟺
    * component w·64+b is strictly positive) into ceil(dim/64) longs.
    * The stored artifact a 100 TB stage-one scan reads INSTEAD of the
    * fp corpus: dim×4 bytes → dim/8 bytes (32×). The packing
    * expression is a static OR-tree over 64 `when`s per word — plain
    * codegen'd conditionals, no higher-order functions — and this is
    * index-BUILD cost, paid once per corpus. A vector of the wrong
    * length fails loudly (a silent zero-bit tail would quietly rank
    * everything near it). */
  def signEncode(corpus: DataFrame, embCol: String, idCol: String,
                 dim: Int): DataFrame = {
    require(dim >= 1, "dim must be >= 1")
    // Tight-loop UDF, not the when-OR expression tree (round 21): the
    // static 64-conditional packing expression per word looked
    // codegen-friendly but measured 12-24 s per 2000-row build at
    // sf0.1 AND degraded across runs (a fresh expression id defeats
    // the codegen cache, and the generated when-chain is too large to
    // JIT cleanly) vs 0.1 s for the loop — the pqEncodeBig/ivfAssignBig
    // exception applied here, identical bits by AnnSpec's packing spec.
    // Same contracts: null embeddings dropped, wrong length fails
    // loudly with the id in the message.
    val enc = udf { (emb: Seq[Double], id: String) =>
      if (emb.length != dim)
        throw new IllegalArgumentException(
          s"signEncode: expected dim $dim, got ${emb.length} for id $id")
      val out = new Array[Long]((dim + 63) / 64)
      var i = 0
      while (i < dim) {
        if (emb(i) > 0) out(i / 64) |= 1L << (i % 64)
        i += 1
      }
      out
    }
    corpus.filter(col(embCol).isNotNull)
      .select(col(idCol),
        enc(col(embCol).cast("array<double>"),
          col(idCol).cast("string")).as("sign_code"))
  }

  /** Driver-side twin of [[signEncode]] for the (1-row) query vector. */
  def signCode(vec: Array[Double]): Array[Long] = {
    val out = new Array[Long]((vec.length + 63) / 64)
    var i = 0
    while (i < vec.length) {
      if (vec(i) > 0) out(i / 64) |= 1L << (i % 64)
      i += 1
    }
    out
  }

  /** Two-stage search served from a stored [[signEncode]] table: stage
    * one scans ONLY the packed codes and ranks by Hamming distance —
    * per word one XOR against the broadcast-constant query code and
    * one `bit_count`, all codegen'd, summed statically across words
    * (no HOF) — keeping a (hamming, id)-ordered k·candMult heap per
    * partition (TakeOrderedAndProject; only k·candMult rows ever leave
    * the executors). Stage two broadcast-joins the survivors back to
    * the fp corpus and reranks by exact cosine. Both stages are
    * total-ordered ((hamming, id) then (cos desc, id)), so the cuts
    * are deterministic and the oracle replays them stage for stage.
    * Hamming ties are MASSIVE by construction (integer distances on a
    * 64-bit code) — the id tie-break is what makes the candidate cut
    * an exact contract rather than a races-with-the-scheduler one.
    *
    * `dim` is the ENCODED dimension (what [[signEncode]] was built
    * with) and the query must match it exactly: deriving the word
    * count from the query instead would let a SHORT query silently
    * ignore the stored codes' trailing words. The stored width is
    * ALSO asserted inside the plan (size(sign_code) == word count),
    * so a table encoded at a different dimension than the caller's
    * `dim` fails loudly at scan time in both directions — the
    * contract does not rest on the caller passing the right dim. */
  def signSearchEncoded(encoded: DataFrame, vectors: DataFrame,
                        embCol: String, idCol: String,
                        queryVec: Array[Double], dim: Int, k: Int,
                        candMult: Int = 4): DataFrame = {
    require(k >= 1 && candMult >= 1 && dim >= 1,
      "k, candMult and dim must be >= 1")
    require(queryVec.length == dim,
      s"signSearchEncoded: query vector has ${queryVec.length} components " +
        s"but the encoded dimension is $dim — a shorter query would " +
        "silently ignore the stored codes' trailing dimensions")
    val q = signCode(queryVec)
    val ham = q.indices.map { w =>
      bit_count(element_at(col("sign_code"), w + 1).bitwiseXOR(lit(q(w))))
    }.reduce(_ + _).cast("long")
    // Plan-level width contract: the stored code must pack to EXACTLY
    // the query's word count. The null-hamming guard below only trips
    // when the query is LONGER than the stored code (element_at past
    // the end); a stored code with MORE words (encoded at dim=128,
    // searched at dim=64) would otherwise silently ignore its trailing
    // Hamming words — so the width itself is asserted first.
    val survivors = encoded
      .filter(col("sign_code").isNotNull)
      .select(col(idCol),
        when(size(col("sign_code")) =!= q.length,
          raise_error(concat(
            lit("signSearchEncoded: stored sign_code has "),
            size(col("sign_code")).cast("string"),
            lit(s" words but dim=$dim packs to ${q.length} — the table " +
              "was encoded at a different dimension; id "),
            col(idCol).cast("string"))))
        .when(ham.isNull,
          raise_error(concat(
            lit("signSearchEncoded: null hamming (word-count mismatch) for id "),
            col(idCol).cast("string"))))
          .otherwise(ham).as("hamming"))
      .orderBy(col("hamming"), col(idCol))
      .limit(k * candMult)
    broadcast(survivors)
      .join(vectors.select(col(idCol), col(embCol)), Seq(idCol))
      .withColumn("cos", VectorFunctions.cosine(
        col(embCol).cast("array<double>"),
        typedlit(queryVec.toSeq)))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
      .select(col(idCol), col("hamming"), col("cos"))
  }

  /** Batch form of [[signSearchEncoded]] (the v19 treatment): ONE scan
    * of the stored code table serves a whole query set. The bounded
    * query set packs driver-side and broadcasts as (qid, code-words);
    * Hamming stays the static codegen'd XOR+bit_count sum (the word
    * count comes from `dim`, not per-row data); the per-query
    * candidate cut is the bounded TopK aggregation (map-side partial
    * heaps — only nq·k·candMult (hamming, id) entries cross the
    * exchange, never one row per (query, vector) pair); the exact
    * rerank joins the ≤ nq·k·candMult survivors back to the fp corpus
    * by broadcast and cuts per query with the same (cos desc, id)
    * total order as the single-query form. */
  def signSearchEncodedBatch(encoded: DataFrame, vectors: DataFrame,
                             embCol: String, idCol: String,
                             queries: DataFrame, qidCol: String,
                             qvecCol: String, dim: Int, k: Int,
                             candMult: Int = 4): DataFrame = {
    require(k >= 1 && candMult >= 1 && dim >= 1,
      "k, candMult and dim must be >= 1")
    // The bounded TopK aggregator carries ids as long, so the id and
    // qid columns are CAST — under non-ANSI casts a non-numeric id
    // would become null and its rows silently vanish from the heap.
    // Require integral ids loudly instead (the single-query form keeps
    // arbitrary id types; use it for non-numeric ids).
    def requireIntegral(df: DataFrame, c: String, role: String): Unit = {
      import org.apache.spark.sql.types._
      val dt = df.schema(c).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"signSearchEncodedBatch: $role column $c is $dt — non-integral " +
          "ids would be nulled by the internal long cast and their rows " +
          "silently dropped from TopK; use signSearchEncoded (which keeps " +
          "the id column untyped) for non-numeric ids")
    }
    requireIntegral(encoded, idCol, "id")
    requireIntegral(queries, qidCol, "query id")
    val sp = encoded.sparkSession
    import sp.implicits._
    val qrows: Seq[(Long, Seq[Long])] = queries
      .select(col(qidCol).cast("long"), col(qvecCol).cast("array<double>"))
      .collect().toSeq
      .map { r =>
        val v = r.getSeq[Double](1).toArray
        require(v.length == dim,
          s"query ${r.getLong(0)}: expected dim $dim, got ${v.length}")
        (r.getLong(0), signCode(v).toSeq)
      }
    require(qrows.nonEmpty, "query set must be non-empty")
    val qdf = broadcast(qrows.toDF(qidCol, "__qcode"))
    val words = (dim + 63) / 64
    val ham = (0 until words).map { w =>
      bit_count(element_at(col("sign_code"), w + 1)
        .bitwiseXOR(element_at(col("__qcode"), w + 1)))
    }.reduce(_ + _).cast("double")
    // Same stored-width contract as the single-query form: a code
    // table encoded at a wider dim than `dim` would silently drop its
    // trailing Hamming words, so the width is asserted in the plan.
    val hamChecked =
      when(size(col("sign_code")) =!= words,
        raise_error(concat(
          lit("signSearchEncodedBatch: stored sign_code has "),
          size(col("sign_code")).cast("string"),
          lit(s" words but dim=$dim packs to $words — the table was " +
            "encoded at a different dimension; id "),
          col(idCol).cast("string"))))
        .otherwise(ham)
    val survivors = encoded.filter(col("sign_code").isNotNull)
      .crossJoin(qdf)
      .select(col(qidCol), hamChecked.as("__h"), col(idCol).cast("long").as("__id"))
      .groupBy(qidCol)
      .agg(TopK.topK(k * candMult)(col("__h"), col("__id")).as("__cand"))
      .select(col(qidCol), explode(col("__cand")).as("__e"))
      .select(col(qidCol), col("__e.id").as(idCol),
        col("__e.dist").cast("long").as("hamming"))
    val qvecs = broadcast(queries.select(col(qidCol),
      col(qvecCol).cast("array<double>").as("__qv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qidCol).orderBy(desc("cos"), col(idCol))
    broadcast(survivors)
      .join(vectors.select(col(idCol), col(embCol)), Seq(idCol))
      .join(qvecs, Seq(qidCol))
      .withColumn("cos", VectorFunctions.cosine(
        col(embCol).cast("array<double>"), col("__qv")))
      .withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= k)
      .select(col(qidCol), col("knn_rank"), col(idCol),
        col("hamming"), col("cos"))
  }

  // ---------------------------------------------------------------------
  // Matryoshka (prefix-dimension) serving — Kusupati et al. 2022,
  // "Matryoshka Representation Learning" (NeurIPS): MRL-trained
  // embeddings concentrate coarse similarity in the leading
  // dimensions, so a stage-one scan over just the first m components
  // reads m/dim of the bytes (16/64 = 4× here) and the full vector is
  // only touched for the bounded rerank set. Same two-stage contract
  // as the int8/PQ/sign families — the prefix column is the stored
  // artifact, column pruning never reads the fp corpus in stage one.
  // ---------------------------------------------------------------------

  /** The prefix artifact: (id, first-`prefixDim`-components) as its
    * own stored table. A too-short vector fails loudly — `slice`
    * would otherwise silently hand stage one a truncated prefix that
    * ranks the vector closer than it is. */
  def prefixEncode(corpus: DataFrame, embCol: String, idCol: String,
                   prefixDim: Int): DataFrame = {
    require(prefixDim >= 1, "prefixDim must be >= 1")
    corpus.filter(col(embCol).isNotNull)
      .select(
        when(size(col(embCol)) < prefixDim,
          raise_error(concat(
            lit(s"prefixEncode: embedding shorter than prefixDim $prefixDim for id "),
            col(idCol).cast("string"))))
          .otherwise(col(idCol)).as(idCol),
        slice(col(embCol).cast("array<double>"), 1, prefixDim)
          .as("prefix_vec"))
  }

  /** Two-stage search served from a stored [[prefixEncode]] table:
    * stage one ranks by L2 over the prefix (narrow scan of the small
    * artifact; per-partition k·candMult heap), stage two broadcast-
    * joins survivors to the fp corpus and reranks by full-dimension
    * L2. Total orders ((prefix_dist, id), then (dist, id)) make both
    * cuts deterministic; the oracle replays them over array slices.
    *
    * Recall caveat, measured (round-14 candMult sweep, PLANS.md): the
    * prefix cut only ranks well when the embedding model concentrates
    * information in the leading components (matryoshka/MRL-trained
    * embeddings — Kusupati et al. 2022). On embeddings WITHOUT that
    * training the prefix rung can trail even the 8× smaller sign rung
    * (0.16→0.57 recall@10 over candMult 1→16 on the synthetic corpus,
    * vs sign's 0.19→0.69 and int8's 1.00 at candMult=2) — pick this
    * rung for its bytes only when the model is MRL-trained, and prefer
    * the int8 rung when 80 B/vec is affordable. */
  def prefixSearchEncoded(encoded: DataFrame, vectors: DataFrame,
                          embCol: String, idCol: String,
                          queryVec: Array[Double], prefixDim: Int,
                          k: Int, candMult: Int = 4): DataFrame = {
    require(k >= 1 && candMult >= 1, "k and candMult must be >= 1")
    require(queryVec.length >= prefixDim,
      s"query vector shorter than prefixDim $prefixDim")
    val pd = VectorFunctions.l2(col("prefix_vec"),
      typedlit(queryVec.take(prefixDim).toSeq))
    val survivors = encoded
      .filter(col("prefix_vec").isNotNull)
      .select(col(idCol),
        when(pd.isNull,
          raise_error(concat(
            lit("prefixSearchEncoded: null prefix distance for id "),
            col(idCol).cast("string"))))
          .otherwise(pd).as("prefix_dist"))
      .orderBy(col("prefix_dist"), col(idCol))
      .limit(k * candMult)
    broadcast(survivors)
      .join(vectors.select(col(idCol), col(embCol)), Seq(idCol))
      .withColumn("dist", VectorFunctions.l2(
        col(embCol).cast("array<double>"), typedlit(queryVec.toSeq)))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
      .select(col(idCol), col("prefix_dist"), col("dist"))
  }

  // ---------------------------------------------------------------------
  // Batch serving forms for the int8 and prefix rungs — the
  // signSearchEncodedBatch treatment applied to the rest of the
  // quantizer ladder, with the round-14 top-k idiom: the per-query cut
  // is a `row_number <= k·candMult` rank-limit window, which Spark's
  // InferWindowGroupLimit executes as a map-side PARTIAL group-limit —
  // the code-table × queries pair stream never shuffles (only ≤ cut
  // rows per map partition per query do). Wall-clock-equal to the
  // TopK Aggregator on identical pair streams (PLANS.md round-14
  // correction); chosen because it is native end-to-end and the
  // partial group-limit is plan-auditable. Shared guard contract:
  // integral ids (non-ANSI long casts would null non-numeric ids and
  // silently drop their rows), and the stored artifact's width
  // asserted IN THE PLAN against each query's width, so a table
  // encoded at a different dimension fails loudly at scan time in
  // both directions.
  // ---------------------------------------------------------------------

  private[operators] def requireIntegralId(df: DataFrame, c: String,
                                           who: String, role: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.schema(c).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"$who: $role column $c is $dt — non-integral ids would be nulled " +
        "by the internal long cast and their rows silently dropped; use " +
        "the single-query form (which keeps the id column untyped) for " +
        "non-numeric ids")
  }

  /** [[quantizedSearchEncoded]] for a BATCH of queries: stage one
    * scans the stored int8 code table ONCE against all queries
    * (dequantized cosine per pair, per-query rank-limit cut), stage
    * two reranks the ≤ k·candMult survivors per query exactly.
    * Output: (qid, knn_rank, id, approx_cos, cos) — per-query rows
    * identical to the single-query form's (AnnSpec asserts). */
  def quantizedSearchEncodedBatch(encoded: DataFrame, vectors: DataFrame,
                                  embCol: String, idCol: String,
                                  queries: DataFrame, qidCol: String,
                                  qvecCol: String, k: Int,
                                  candMult: Int = 4): DataFrame = {
    require(k >= 1 && candMult >= 1, "k and candMult must be >= 1")
    requireIntegralId(encoded, idCol, "quantizedSearchEncodedBatch", "id")
    requireIntegralId(queries, qidCol, "quantizedSearchEncodedBatch",
      "query id")
    val qdf = broadcast(queries.select(col(qidCol).cast("long").as("__qid"),
      col(qvecCol).cast("array<double>").as("__qv")))
    val deq = transform(col("q_codes"), c =>
      c.cast("double") * col("q_scale") + col("q_mn"))
    val approx =
      when(size(col("q_codes")) =!= size(col("__qv")),
        raise_error(concat(
          lit("quantizedSearchEncodedBatch: stored q_codes has "),
          size(col("q_codes")).cast("string"),
          lit(" components but the query has "),
          size(col("__qv")).cast("string"),
          lit(" — the table was encoded at a different dimension; id "),
          col(idCol).cast("string"))))
        .otherwise(VectorFunctions.cosine(deq, col("__qv")))
    val w1 = Window.partitionBy("__qid")
      .orderBy(desc("approx_cos"), col("__id"))
    val survivors = encoded.filter(col("q_codes").isNotNull)
      .crossJoin(qdf)
      .select(col("__qid"), col(idCol).cast("long").as("__id"),
        approx.as("approx_cos"))
      .withColumn("__rn", row_number().over(w1))
      .filter(col("__rn") <= k * candMult)
      .drop("__rn")
    val w2 = Window.partitionBy("__qid").orderBy(desc("cos"), col("__id"))
    broadcast(survivors)
      .join(vectors.select(col(idCol).cast("long").as("__id"), col(embCol)),
        Seq("__id"))
      .join(qdf, Seq("__qid"))
      .withColumn("cos", VectorFunctions.cosine(
        col(embCol).cast("array<double>"), col("__qv")))
      .withColumn("knn_rank", row_number().over(w2))
      .filter(col("knn_rank") <= k)
      .select(col("__qid").as(qidCol), col("knn_rank"),
        col("__id").as(idCol), col("approx_cos"), col("cos"))
  }

  /** [[pqSearchEncoded]] for a BATCH of queries — the last rung of the
    * batch-serving ladder. Each query's ADC lookup table (m × nCodes
    * subspace squared distances) is computed DRIVER-SIDE from the
    * collected codebooks — the same per-query cost the single form
    * pays — and broadcast as an array-of-arrays column; stage one then
    * scans the stored code table once for all queries (m table lookups
    * + adds per pair, per-query rank-limit cut), stage two reranks the
    * bounded survivors by exact L2. Stored code width is asserted in
    * the plan; a null rerank distance fails loudly (artifact
    * inconsistency), as in the single form. Output: (qid, knn_rank,
    * id, approx_dist, dist). */
  def pqSearchEncodedBatch(encoded: DataFrame, vectors: DataFrame,
                           embCol: String, idCol: String,
                           codebooks: DataFrame, queries: DataFrame,
                           qidCol: String, qvecCol: String, k: Int,
                           candMult: Int = 4): DataFrame = {
    require(k >= 1 && candMult >= 1, "k and candMult must be >= 1")
    requireIntegralId(encoded, idCol, "pqSearchEncodedBatch", "id")
    requireIntegralId(queries, qidCol, "pqSearchEncodedBatch", "query id")
    val cbs = collectCodebooks(codebooks)
    val subDim = cbs(0)(0).length
    val m = cbs.length
    val sp = encoded.sparkSession
    import sp.implicits._
    val qrows: Seq[(Long, Seq[Seq[Double]], Seq[Double])] = queries
      .select(col(qidCol).cast("long"), col(qvecCol).cast("array<double>"))
      .collect().toSeq
      .map { r =>
        val v = r.getSeq[Double](1).toArray
        require(v.length == m * subDim,
          s"query ${r.getLong(0)}: expected dim ${m * subDim}, got ${v.length}")
        val luts = cbs.indices.map { j =>
          val qSub = v.slice(j * subDim, (j + 1) * subDim)
          cbs(j).map(cw => l2sqStrict(qSub, cw)).toSeq
        }
        (r.getLong(0), luts, v.toSeq)
      }
    require(qrows.nonEmpty, "query set must be non-empty")
    val qdf = broadcast(qrows.toDF("__qid", "__luts", "__qv"))
    // j ascending, left-assoc adds — the oracle mirrors this fold
    val adc = (0 until m)
      .map(j => element_at(element_at(col("__luts"), j + 1),
        element_at(col("pq_codes"), j + 1) + 1))
      .reduce(_ + _)
    val approx =
      when(size(col("pq_codes")) =!= m,
        raise_error(concat(
          lit("pqSearchEncodedBatch: stored pq_codes has "),
          size(col("pq_codes")).cast("string"),
          lit(s" codes but the codebook has $m subspaces — the table was " +
            "encoded with a different codebook; id "),
          col(idCol).cast("string"))))
        .otherwise(sqrt(adc))
    val w1 = Window.partitionBy("__qid")
      .orderBy(col("approx_dist"), col("__id"))
    val survivors = encoded.filter(col("pq_codes").isNotNull)
      .crossJoin(qdf)
      .select(col("__qid"), col(idCol).cast("long").as("__id"),
        approx.as("approx_dist"))
      .withColumn("__rn", row_number().over(w1))
      .filter(col("__rn") <= k * candMult)
      .drop("__rn")
    val d0 = VectorFunctions.l2(col(embCol).cast("array<double>"), col("__qv"))
    val distChecked = when(d0.isNull, raise_error(concat(
        lit("pqSearchEncodedBatch: null rerank distance (dim mismatch or " +
          "null vector) for id "),
        col("__id").cast("string")))).otherwise(d0)
    val w2 = Window.partitionBy("__qid").orderBy(col("dist"), col("__id"))
    broadcast(survivors)
      .join(vectors.select(col(idCol).cast("long").as("__id"), col(embCol)),
        Seq("__id"))
      .join(qdf.select("__qid", "__qv"), Seq("__qid"))
      .withColumn("dist", distChecked)
      .withColumn("knn_rank", row_number().over(w2))
      .filter(col("knn_rank") <= k)
      .select(col("__qid").as(qidCol), col("knn_rank"),
        col("__id").as(idCol), col("approx_dist"), col("dist"))
  }

  /** [[ivfPqSearchEncoded]] for a BATCH of queries — IVFADC serving
    * with BOTH prunings per query: each query's probe list (nprobe
    * nearest centroids, the ivfSearch tie-break) and its ADC lookup
    * table are computed driver-side (centroids and codebooks are
    * k-row tables by definition) and broadcast; the stored code table
    * is first filtered to the UNION of all probed clusters — a static
    * partition filter the parquet reader prunes on under the
    * partitionBy(cluster_id) layout — then equi-joined to the
    * (qid, cluster) probe map so each code row is ADC-scored only for
    * the queries that probe its cluster. Per-query cuts are rank-limit
    * windows; the exact rerank touches the bounded survivors. Output:
    * (qid, knn_rank, id, approx_dist, dist) — per-query rows identical
    * to [[ivfPqSearchEncoded]] (AnnSpec asserts). */
  def ivfPqSearchEncodedBatch(encoded: DataFrame, vectors: DataFrame,
                              embCol: String, idCol: String,
                              centroids: DataFrame, cidCol: String,
                              cvecCol: String, codebooks: DataFrame,
                              queries: DataFrame, qidCol: String,
                              qvecCol: String, k: Int, nprobe: Int,
                              candMult: Int = 4): DataFrame = {
    require(k >= 1 && candMult >= 1 && nprobe >= 1,
      "k, candMult and nprobe must be >= 1")
    require(encoded.columns.contains("cluster_id"),
      "ivfPqSearchEncodedBatch needs a cluster-assigned code table " +
        "(cluster_id column)")
    requireIntegralId(encoded, idCol, "ivfPqSearchEncodedBatch", "id")
    requireIntegralId(queries, qidCol, "ivfPqSearchEncodedBatch", "query id")
    val cbs = collectCodebooks(codebooks)
    val subDim = cbs(0)(0).length
    val m = cbs.length
    val cents = collectCentroids(centroids, cidCol, cvecCol)
    val sp = encoded.sparkSession
    import sp.implicits._
    val qrows: Seq[(Long, Seq[Seq[Double]], Seq[Double], Seq[Long])] =
      queries
        .select(col(qidCol).cast("long"), col(qvecCol).cast("array<double>"))
        .collect().toSeq
        .map { r =>
          val v = r.getSeq[Double](1).toArray
          require(v.length == m * subDim,
            s"query ${r.getLong(0)}: expected dim ${m * subDim}, " +
              s"got ${v.length}")
          val luts = cbs.indices.map { j =>
            val qSub = v.slice(j * subDim, (j + 1) * subDim)
            cbs(j).map(cw => l2sqStrict(qSub, cw)).toSeq
          }
          val probed = cents
            .map { case (cid, cv) => (cid, l2sqStrict(cv, v)) }
            .sortBy { case (cid, dd) => (dd, cid) }
            .take(nprobe).map(_._1)
          (r.getLong(0), luts, v.toSeq, probed)
        }
    require(qrows.nonEmpty, "query set must be non-empty")
    val qdf = broadcast(qrows.map { case (q, l, v, _) => (q, l, v) }
      .toDF("__qid", "__luts", "__qv"))
    val probeMap = broadcast(qrows
      .flatMap { case (q, _, _, probed) => probed.map(c => (q, c)) }
      .toDF("__qid", "__pcid"))
    val allProbed = qrows.flatMap(_._4).distinct
    val adc = (0 until m)
      .map(j => element_at(element_at(col("__luts"), j + 1),
        element_at(col("pq_codes"), j + 1) + 1))
      .reduce(_ + _)
    val approx =
      when(size(col("pq_codes")) =!= m,
        raise_error(concat(
          lit("ivfPqSearchEncodedBatch: stored pq_codes has "),
          size(col("pq_codes")).cast("string"),
          lit(s" codes but the codebook has $m subspaces — the table was " +
            "encoded with a different codebook; id "),
          col(idCol).cast("string"))))
        .otherwise(sqrt(adc))
    val w1 = Window.partitionBy("__qid")
      .orderBy(col("approx_dist"), col("__id"))
    val survivors = encoded
      .filter(col("cluster_id").isin(allProbed: _*)) // reader pruning
      .filter(col("pq_codes").isNotNull)
      .join(probeMap, col("cluster_id").cast("long") === col("__pcid"))
      .join(qdf, Seq("__qid"))
      .select(col("__qid"), col(idCol).cast("long").as("__id"),
        approx.as("approx_dist"))
      .withColumn("__rn", row_number().over(w1))
      .filter(col("__rn") <= k * candMult)
      .drop("__rn")
    val d0 = VectorFunctions.l2(col(embCol).cast("array<double>"), col("__qv"))
    val distChecked = when(d0.isNull, raise_error(concat(
        lit("ivfPqSearchEncodedBatch: null rerank distance (dim mismatch " +
          "or null vector) for id "),
        col("__id").cast("string")))).otherwise(d0)
    val w2 = Window.partitionBy("__qid").orderBy(col("dist"), col("__id"))
    broadcast(survivors)
      .join(vectors.select(col(idCol).cast("long").as("__id"), col(embCol)),
        Seq("__id"))
      .join(qdf.select("__qid", "__qv"), Seq("__qid"))
      .withColumn("dist", distChecked)
      .withColumn("knn_rank", row_number().over(w2))
      .filter(col("knn_rank") <= k)
      .select(col("__qid").as(qidCol), col("knn_rank"),
        col("__id").as(idCol), col("approx_dist"), col("dist"))
  }

  /** [[prefixSearchEncoded]] for a BATCH of queries: stage one scans
    * the stored prefix table ONCE against all queries (prefix L2 per
    * pair, per-query rank-limit cut), stage two reranks by
    * full-dimension L2. Stored prefix width and each query's length
    * are asserted in the plan, and a null prefix/rerank distance fails
    * loudly (both cuts are ascending NULLS FIRST, so an unguarded null
    * would silently occupy the top-k — same guard as the pq/ivfpq
    * batch forms). Output: (qid, knn_rank, id, prefix_dist, dist). */
  def prefixSearchEncodedBatch(encoded: DataFrame, vectors: DataFrame,
                               embCol: String, idCol: String,
                               queries: DataFrame, qidCol: String,
                               qvecCol: String, prefixDim: Int, k: Int,
                               candMult: Int = 4): DataFrame = {
    require(k >= 1 && candMult >= 1 && prefixDim >= 1,
      "k, candMult and prefixDim must be >= 1")
    requireIntegralId(encoded, idCol, "prefixSearchEncodedBatch", "id")
    requireIntegralId(queries, qidCol, "prefixSearchEncodedBatch",
      "query id")
    val qdf = broadcast(queries.select(col(qidCol).cast("long").as("__qid"),
      when(size(col(qvecCol)) < prefixDim,
        raise_error(concat(
          lit(s"prefixSearchEncodedBatch: query shorter than prefixDim " +
            s"$prefixDim — qid "),
          col(qidCol).cast("string"))))
        .otherwise(col(qvecCol).cast("array<double>")).as("__qv")))
    val pd0 = VectorFunctions.l2(col("prefix_vec"),
      slice(col("__qv"), 1, prefixDim))
    val pd =
      when(size(col("prefix_vec")) =!= prefixDim,
        raise_error(concat(
          lit("prefixSearchEncodedBatch: stored prefix_vec has "),
          size(col("prefix_vec")).cast("string"),
          lit(s" components but prefixDim is $prefixDim — the table was " +
            "encoded at a different prefix width; id "),
          col(idCol).cast("string"))))
        // null prefix distance (null vector element): both cuts order
        // ascending with NULLS FIRST, so an unguarded null would occupy
        // the top-k silently — fail loudly like the single-query form
        // and the pq/ivfpq batch forms.
        .when(pd0.isNull,
          raise_error(concat(
            lit("prefixSearchEncodedBatch: null prefix distance for id "),
            col(idCol).cast("string"))))
        .otherwise(pd0)
    val w1 = Window.partitionBy("__qid")
      .orderBy(col("prefix_dist"), col("__id"))
    val survivors = encoded.filter(col("prefix_vec").isNotNull)
      .crossJoin(qdf)
      .select(col("__qid"), col(idCol).cast("long").as("__id"),
        pd.as("prefix_dist"))
      .withColumn("__rn", row_number().over(w1))
      .filter(col("__rn") <= k * candMult)
      .drop("__rn")
    val d0 = VectorFunctions.l2(col(embCol).cast("array<double>"), col("__qv"))
    val distChecked = when(d0.isNull, raise_error(concat(
        lit("prefixSearchEncodedBatch: null rerank distance (dim mismatch " +
          "or null vector) for id "),
        col("__id").cast("string")))).otherwise(d0)
    val w2 = Window.partitionBy("__qid").orderBy(col("dist"), col("__id"))
    broadcast(survivors)
      .join(vectors.select(col(idCol).cast("long").as("__id"), col(embCol)),
        Seq("__id"))
      .join(qdf, Seq("__qid"))
      .withColumn("dist", distChecked)
      .withColumn("knn_rank", row_number().over(w2))
      .filter(col("knn_rank") <= k)
      .select(col("__qid").as(qidCol), col("knn_rank"),
        col("__id").as(idCol), col("prefix_dist"), col("dist"))
  }
}
