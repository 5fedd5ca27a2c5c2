package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
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
    val cents = centroids.select(col(cidCol), col(cvecCol)).collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble))
    }
    require(cents.nonEmpty, "centroid table is empty")
    val distStructs = array(cents.map { case (cid, v) =>
      struct(
        VectorFunctions.l2(col(embCol), typedlit(v)).as("d"),
        lit(cid).as("cid"))
    }.toIndexedSeq: _*)
    // array_min orders structs lexicographically: min distance first,
    // then min centroid id — the deterministic tie-break for free.
    // Degenerate rows must not assign silently: a null distance (null
    // embedding, null element, or dim mismatch) sorts FIRST in struct
    // order, so unguarded array_min would hand such rows cluster
    // min-cid. Contract (same as ivfAssignBig): null embedding → null
    // cluster_id; a non-null embedding whose distance is null (dim
    // mismatch / null element) fails loudly.
    val best = array_min(distStructs)
    corpus.withColumn("cluster_id",
      when(col(embCol).isNull, lit(null).cast("long"))
        .when(best.getField("d").isNull,
          raise_error(concat(
            lit("ivfAssign: null distance (dim mismatch or null element) for id "),
            col(idCol).cast("string"))))
        .otherwise(best.getField("cid")))
  }

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
      else {
        val cs = bc.value
        val arr = emb.toArray
        var bestCid = cs(0)._1
        var bestD = Double.MaxValue
        var i = 0
        while (i < cs.length) {
          val d = l2sqStrict(arr, cs(i)._2)
          if (d < bestD) { bestD = d; bestCid = cs(i)._1 }
          i += 1
        }
        Some(bestCid)
      }
    }
    corpus.withColumn("cluster_id", assign(col(embCol).cast("array<double>")))
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
    * directories. */
  def ivfSearchStore(spark: org.apache.spark.sql.SparkSession, path: String,
                     embCol: String, idCol: String,
                     centroids: DataFrame, cidCol: String, cvecCol: String,
                     queryVec: Column, k: Int, nprobe: Int): DataFrame = {
    val probed = centroids
      .withColumn("__qdist", VectorFunctions.l2(col(cvecCol), queryVec))
      .orderBy(col("__qdist"), col(cidCol))
      .limit(nprobe)
      .select(col(cidCol).cast("long"))
      .collect().map(_.getLong(0))
    Knn.exact(
      graft.sources.IndexStore.load(spark, path)
        .filter(col("cluster_id").isin(probed: _*)),
      embCol, idCol, queryVec, k)
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
    import org.apache.spark.sql.expressions.Window
    // Rename the query frame's columns to reserved __q* names up front:
    // if the caller's qidCol/qvecCol collide with a column of `assigned`
    // or `centroids` (e.g. both vector columns named "embedding"), the
    // un-renamed join would be ambiguous or silently bind the wrong side.
    val q = queries.select(col(qidCol).as("__qid"), col(qvecCol).as("__qvec"))
    val probeW = Window.partitionBy("__qid").orderBy(col("__qdist"), col(cidCol))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("__qdist", VectorFunctions.l2(col(cvecCol), col("__qvec")))
      .withColumn("__pr", row_number().over(probeW))
      .filter(col("__pr") <= nprobe)
      .select(col("__qid"), col("__qvec"), col(cidCol).as("cluster_id"))
    assigned.join(broadcast(probes), Seq("cluster_id"))
      .select(col("__qid"),
        VectorFunctions.l2(col(embCol), col("__qvec")).as("__dist"),
        col(idCol).cast("long").as("__id"))
      .groupBy("__qid")
      .agg(TopK.topK(k)(col("__dist"), col("__id")).as("__topk"))
      .select(col("__qid"), posexplode(col("__topk")).as(Seq("__pos", "__entry")))
      .select(col("__qid").as(qidCol),
        (col("__pos") + 1).cast("int").as("knn_rank"),
        col("__entry.id").as(idCol), col("__entry.dist").as("dist"))
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

  /** IVF search: probe the `nprobe` centroids nearest to the query,
    * exact top-k inside those clusters only. `assigned` is the output
    * of [[ivfAssign]] (ideally written partitioned by cluster_id). */
  def ivfSearch(assigned: DataFrame, embCol: String, idCol: String,
                centroids: DataFrame, cidCol: String, cvecCol: String,
                queryVec: Column, k: Int, nprobe: Int): DataFrame = {
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
}
