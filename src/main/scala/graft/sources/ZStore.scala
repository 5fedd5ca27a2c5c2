package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.ZOrderLayout.ZRank

/** The Z-order layout with a LIFECYCLE — [[ZOrderLayout.writeZOrdered]]
  * is write-once (the first appended batch would land unordered and
  * dilute the per-file min/max envelopes the whole pruning win depends
  * on), so ZStore gives the layout the same versioned, incrementally
  * maintainable shape every other store in this tree has
  * ([[IndexStore]]'s versions, the band/shingle stores' pruned
  * buckets), re-expressed for a layout whose artifact is FILE ORDER
  * rather than a partition-keyed table. Reference analog: the
  * persisted store is upsert-by-id (`build_vectorstore.py:239`) — a
  * layout that only works write-once is half an operator.
  *
  * Design — a minimal manifest store (the public Delta/Iceberg idea,
  * cut down to single-writer batch maintenance):
  *
  *  - **Data pool.** Immutable parquet files under `root/data/<uuid>/`,
  *    each holding one contiguous CURVE-BUCKET range: the Morton key's
  *    top `bucketBits` bits partition the curve into 2^bucketBits
  *    contiguous segments, every write repartitions to one file per
  *    touched bucket and sorts by the full key inside. Because a
  *    file never spans buckets, its per-column min/max is bounded by
  *    its bucket's curve envelope BY CONSTRUCTION — absorbed batches
  *    cannot dilute old files' statistics (they are immutable) and
  *    the new files' statistics stay bucket-tight.
  *  - **Versions.** `root/v<N>/` holds only metadata: `_zmeta.json`
  *    (layout columns, bits, bucketBits, per-column [[ZRank]]
  *    envelopes — absorbed batches rank against the SAME envelopes
  *    the base layout used) and `_manifest.json` (the file list, each
  *    with its bucket). A version is committed by the `_SUCCESS`
  *    marker after an atomic staging rename — [[IndexStore]]'s
  *    publish contract; readers resolve the newest committed version
  *    and can never observe a half-published flip. Untouched files
  *    are SHARED across versions: an absorb's new version costs
  *    O(batch) data IO plus one tiny manifest write, never a table
  *    rewrite — at 100 TB that is the difference between appending
  *    and re-laying-out.
  *  - **Absorb** ([[absorb]]): key the batch with the stamped ranks,
  *    write one new file per touched bucket, publish
  *    old-manifest + new-files. Values outside the stamped envelopes
  *    CLAMP into the edge buckets (correct, disclosed: the report
  *    counts them — rising clamp mass is the re-layout signal).
  *  - **Maintain** ([[maintain]]): fold buckets fragmented past
  *    `maxFilesPerBucket` back to one sorted file each — cost ∝ dirty
  *    buckets, gated by an exact row-count reconciliation (a rewrite
  *    that loses or duplicates rows refuses to publish and removes
  *    its own debris). Fragmentation costs listing/open overhead and
  *    intra-bucket sort, NOT envelope width — so maintain is a
  *    scheduled compaction, not a correctness prop.
  *  - **Re-layout** ([[relayout]]): re-derive ranks from current
  *    content and rewrite everything — the full-cost escape hatch for
  *    real envelope drift (the absorb report's clamp counter trending
  *    up). Publishes as just another version.
  *  - **Prune** ([[prune]]): drop old versions, then garbage-collect
  *    pool files no kept manifest references.
  *
  * Single-writer contract as [[IndexStore]]: concurrent publishes race
  * loudly (the rename arbitration), never corrupt; readers only ever
  * see committed manifests over immutable files.
  */
object ZStore {

  /** The layout recipe stamped at init and carried by every absorb:
    * ranks are FROZEN so old and new files agree on the curve.
    * `schemaTypes` are the columns' catalog type strings, aligned with
    * `schemaCols` — the absorb gate compares NAME AND TYPE, because a
    * name-only check would let a drifted column type (x: double →
    * int) publish files whose physical parquet type diverges from the
    * pool's and poison every subsequent union read of the store. */
  final case class ZMeta(cols: Seq[String], bits: Int, bucketBits: Int,
                         ranks: Seq[ZRank], schemaCols: Seq[String],
                         schemaTypes: Seq[String]) {
    def shift: Int = bits * cols.length - bucketBits
    def nBuckets: Int = 1 << bucketBits
  }

  /** One manifest entry: a pool file (path relative to the root) and
    * the curve bucket it covers. */
  final case class ZFile(path: String, bucket: Int)

  /** Cumulative absorb statistics SINCE the current envelopes were
    * derived (init or relayout reset them), persisted in every
    * version's manifest: the scaladoc's "rising clamp counter is the
    * re-layout signal" as durable state a scheduler can read, instead
    * of a per-call report it would have to track externally. */
  final case class ZStats(absorbedRows: Long, oobRows: Long) {
    def clampFraction: Double =
      if (absorbedRows == 0) 0.0 else oobRows.toDouble / absorbedRows
  }

  /** The maintenance decision [[advice]] derives from persisted state
    * alone — no data scan: `action` is "relayout" (clamp fraction over
    * the floor: the stamped envelopes no longer cover the stream and
    * edge buckets are absorbing the overflow), "maintain" (buckets
    * fragmented past the cap), or "healthy". */
  final case class ZAdvice(action: String, fragmentedBuckets: Long,
                           maxFilesInBucket: Long, stats: ZStats,
                           reason: String)

  final case class ZAbsorbReport(version: Long, rowsAbsorbed: Long,
                                 filesAdded: Long, bucketsTouched: Long,
                                 outOfEnvelopeRows: Long, reason: String)

  final case class ZMaintainReport(version: Option[Long],
                                   dirtyBuckets: Long, filesBefore: Long,
                                   filesAfter: Long, rowsRewritten: Long,
                                   reason: String)

  // ---------------------------------------------------------------
  // Init / read
  // ---------------------------------------------------------------

  /** Lay `df` out Z-ordered on `cols` as version 1 of a new store at
    * `root`: derive the ranks ([[ZOrderLayout.columnRanks]] — loud
    * type validation, optional equal-depth), write one sorted file
    * per curve bucket into the pool, publish (meta, manifest). */
  def init(df: DataFrame, cols: Seq[String], root: String,
           bits: Int = 8, bucketBits: Int = 5,
           equalDepth: Boolean = false): Long = {
    val n = cols.length
    require(bits * n <= 62,
      s"bits $bits x $n cols must fit a long (<= 62 bits)")
    require(bucketBits >= 1 && bucketBits <= math.min(12, bits * n),
      s"bucketBits $bucketBits must be in [1, min(12, bits x n_cols)] — " +
        "2^bucketBits contiguous curve segments, driver-listed")
    require(!df.isEmpty, "ZStore.init on an empty table — nothing to lay out")
    Seq("__zkey", "__zb").foreach(r => require(!df.columns.contains(r),
      s"ZStore.init: input carries the reserved layout column `$r` — " +
        "rename it; the store derives its own"))
    val ranks = ZOrderLayout.columnRanks(df, cols, bits, equalDepth)
    val meta = ZMeta(cols, bits, bucketBits, ranks, df.columns.toSeq,
      df.schema.fields.map(_.dataType.catalogString).toSeq)
    val spark = df.sparkSession
    val files = writeDataFiles(df, meta, root)
    publish(spark, root, meta, files, ZStats(0L, 0L))
  }

  /** The newest committed version's rows — the original schema, no
    * layout columns (files are read as leaf paths, so even the bucket
    * directory names stay invisible). Fails loudly when no committed
    * version exists. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val (_, manifest, _) = loadCurrent(spark, root)
    require(manifest.nonEmpty, s"committed manifest under $root is empty")
    spark.read.parquet(manifest.map(f => s"$root/${f.path}"): _*)
  }

  /** The newest committed (meta, manifest, version). */
  def loadCurrent(spark: SparkSession, root: String)
      : (ZMeta, Seq[ZFile], Long) = {
    val vs = IndexStore.committedVersions(spark, root)
    require(vs.nonEmpty, s"no committed z-store version under $root")
    val v = vs.last
    (readMeta(spark, root, v), readManifest(spark, root, v), v)
  }

  /** Read a SPECIFIC committed version — time travel over the shared
    * pool: manifests are snapshots and pool files immutable, so any
    * version inside the [[prune]] retention window reads exactly what
    * it committed (untouched files are shared, never rewritten).
    * Fails loudly on an uncommitted or pruned version. */
  def readVersion(spark: SparkSession, root: String, v: Long): DataFrame = {
    val vs = IndexStore.committedVersions(spark, root)
    require(vs.contains(v),
      s"version v$v is not committed under $root (committed: " +
        s"${vs.mkString(", ")}) — pruned versions and in-flight " +
        "stagings are unreadable by design")
    val manifest = readManifest(spark, root, v)
    require(manifest.nonEmpty, s"manifest of v$v under $root is empty")
    spark.read.parquet(manifest.map(f => s"$root/${f.path}"): _*)
  }

  // ---------------------------------------------------------------
  // Absorb
  // ---------------------------------------------------------------

  /** Absorb `batch` into the layout: rank against the STAMPED
    * envelopes, write one new sorted file per touched bucket, publish
    * a new version whose manifest is old-files + new-files. O(batch)
    * data IO; untouched files are shared, their statistics untouched.
    * The report counts rows that clamped outside the stamped
    * envelopes — pruning for those rows degrades toward the edge
    * buckets' width, and a rising counter is the [[relayout]]
    * signal. Row-count gated like [[maintain]]. */
  def absorb(spark: SparkSession, root: String,
             batch: DataFrame): ZAbsorbReport = {
    val (meta, manifest, v) = loadCurrent(spark, root)
    val storeSig = meta.schemaCols.zip(meta.schemaTypes).sorted
    val batchSig = batch.schema.fields
      .map(f => (f.name, f.dataType.catalogString)).toSeq.sorted
    require(batchSig == storeSig, {
      val drift = (batchSig.toSet -- storeSig.toSet) ++
        (storeSig.toSet -- batchSig.toSet)
      s"absorb batch schema does not match the store's — name AND type " +
        s"must agree (a drifted type would write parquet files the pool's " +
        s"union read cannot reconcile); drifted: ${drift.toSeq.sorted
          .map { case (n, t) => s"$n: $t" }.mkString(", ")}"
    })
    if (batch.isEmpty)
      return ZAbsorbReport(v, 0L, 0L, 0L, 0L,
        "empty batch — store unchanged")
    // one bounded aggregate: rows with ANY dimension outside its
    // stamped envelope (they clamp into edge buckets; see scaladoc)
    val types = ZOrderLayout.validateZColumns(batch, meta.cols)
    val oobFlag = meta.cols.lazyZip(types).lazyZip(meta.ranks).map {
      case (c, dt, r) => r.outOfEnvelope(ZOrderLayout.rankInput(dt, c))
    }.reduce(_ || _)
    val Row2 = batch.agg(count(lit(1)), sum(when(oobFlag, 1L).otherwise(0L)))
      .head()
    val (nBatch, nOob) = (Row2.getLong(0),
      if (Row2.isNullAt(1)) 0L else Row2.getLong(1))
    val files = writeDataFiles(batch, meta, root)
    // reconciliation gate: the just-written files must hold exactly
    // the batch (footer-count read — no payload scan)
    val written = spark.read.parquet(files.map(f => s"$root/${f.path}"): _*)
      .count()
    if (written != nBatch) {
      deleteFiles(spark, root, files)
      throw new IllegalStateException(
        s"absorb wrote $written rows for a $nBatch-row batch — refusing " +
          "to publish; new files removed, store unchanged")
    }
    val prior = statsOf(spark, root, v)
    val nv = publish(spark, root, meta, manifest ++ files,
      ZStats(prior.absorbedRows + nBatch, prior.oobRows + nOob))
    ZAbsorbReport(nv, nBatch, files.length.toLong,
      files.map(_.bucket).distinct.length.toLong, nOob,
      s"absorbed $nBatch rows into ${files.length} bucket file(s) as " +
        s"v$nv ($nOob row(s) clamped outside the stamped envelopes)")
  }

  // ---------------------------------------------------------------
  // Maintain / re-layout / prune
  // ---------------------------------------------------------------

  /** Fold buckets fragmented past `maxFilesPerBucket` back to one
    * sorted file each. Cost ∝ dirty buckets; a no-op publishes
    * nothing. Gated: the rewritten files must hold exactly the rows
    * the dirty files held — on mismatch the new files are removed and
    * the store stays on the previous version (the same
    * refuse-to-publish shape as every recall-gated maintenance op). */
  def maintain(spark: SparkSession, root: String,
               maxFilesPerBucket: Int = 1): ZMaintainReport = {
    require(maxFilesPerBucket >= 1,
      s"maxFilesPerBucket $maxFilesPerBucket must be >= 1")
    val (meta, manifest, _) = loadCurrent(spark, root)
    val byBucket = manifest.groupBy(_.bucket)
    val dirty = byBucket.filter(_._2.length > maxFilesPerBucket)
    if (dirty.isEmpty)
      return ZMaintainReport(None, 0L, manifest.length.toLong,
        manifest.length.toLong, 0L,
        s"no bucket above $maxFilesPerBucket file(s) — store unchanged")
    val dirtyFiles = dirty.values.flatten.toSeq
    val rows = spark.read.parquet(dirtyFiles.map(f => s"$root/${f.path}"): _*)
    val before = rows.count()
    val rewritten = writeDataFiles(rows, meta, root)
    val after = spark.read
      .parquet(rewritten.map(f => s"$root/${f.path}"): _*).count()
    if (after != before) {
      deleteFiles(spark, root, rewritten)
      throw new IllegalStateException(
        s"maintain rewrote $before rows as $after — refusing to publish; " +
          "rewritten files removed, store unchanged")
    }
    val untouched = manifest.filterNot(f => dirty.contains(f.bucket))
    val nv = publish(spark, root, meta, untouched ++ rewritten,
      stats(spark, root)) // compaction neither absorbs nor re-ranks
    ZMaintainReport(Some(nv), dirty.size.toLong, manifest.length.toLong,
      (untouched.length + rewritten.length).toLong, before,
      s"compacted ${dirty.size} bucket(s) (${dirtyFiles.length} file(s) " +
        s"-> ${rewritten.length}), $before rows verified, committed v$nv")
  }

  /** Full re-layout from current content with FRESH ranks — the
    * escape hatch for envelope drift (absorb's clamp counter trending
    * up means the stamped [min, max]/dictionary no longer covers the
    * data and edge buckets are absorbing the overflow). Cost ∝ table;
    * publishes as a new version, so readers flip atomically and
    * [[prune]] reclaims the old pool files. */
  def relayout(spark: SparkSession, root: String,
               equalDepth: Boolean = false): Long = {
    val (meta, manifest, _) = loadCurrent(spark, root)
    val current = spark.read.parquet(manifest.map(f => s"$root/${f.path}"): _*)
    val ranks = ZOrderLayout.columnRanks(current, meta.cols, meta.bits,
      equalDepth)
    val fresh = meta.copy(ranks = ranks)
    val files = writeDataFiles(current, fresh, root)
    // fresh envelopes: the clamp counters describe drift SINCE the
    // current envelopes were derived, so they reset here (and at init)
    publish(spark, root, fresh, files, ZStats(0L, 0L))
  }

  /** The cumulative absorb statistics of the current version. */
  def stats(spark: SparkSession, root: String): ZStats = {
    val vs = IndexStore.committedVersions(spark, root)
    require(vs.nonEmpty, s"no committed z-store version under $root")
    statsOf(spark, root, vs.last)
  }

  /** The maintenance decision from persisted state alone — no data
    * scan: relayout when the clamp fraction since the last envelope
    * derivation exceeds `clampFloor` (with at least `minAbsorbed`
    * rows absorbed, so one tiny early batch cannot trigger a
    * full-table rewrite), else maintain when any bucket is fragmented
    * past `maxFilesPerBucket`, else healthy. The same
    * detect-cheaply / act-gated shape as [[IndexMaintenance]]'s
    * drift loop, for the layout axis. */
  def advice(spark: SparkSession, root: String,
             maxFilesPerBucket: Int = 1, clampFloor: Double = 0.05,
             minAbsorbed: Long = 10000L): ZAdvice = {
    require(maxFilesPerBucket >= 1,
      s"maxFilesPerBucket $maxFilesPerBucket must be >= 1")
    require(clampFloor > 0 && clampFloor <= 1,
      s"clampFloor $clampFloor must be in (0, 1]")
    val (_, manifest, v) = loadCurrent(spark, root)
    val st = statsOf(spark, root, v)
    val perBucket = manifest.groupBy(_.bucket).map(_._2.length.toLong)
    val maxFiles = if (perBucket.isEmpty) 0L else perBucket.max
    val fragmented = perBucket.count(_ > maxFilesPerBucket).toLong
    if (st.absorbedRows >= minAbsorbed && st.clampFraction > clampFloor)
      ZAdvice("relayout", fragmented, maxFiles, st,
        f"${st.oobRows} of ${st.absorbedRows} absorbed rows " +
          f"(${st.clampFraction * 100}%.1f%%) clamped outside the stamped " +
          f"envelopes (floor ${clampFloor * 100}%.1f%%) — the envelopes no " +
          "longer cover the stream; relayout re-derives them")
    else if (fragmented > 0)
      ZAdvice("maintain", fragmented, maxFiles, st,
        s"$fragmented bucket(s) above $maxFilesPerBucket file(s) " +
          s"(max $maxFiles) — fold the fragments; envelopes are healthy")
    else
      ZAdvice("healthy", 0L, maxFiles, st,
        "no bucket fragmented and clamp mass under the floor")
  }

  /** Drop all but the newest `keep` committed versions, then
    * garbage-collect pool files no kept manifest references (absorb
    * and maintain share untouched files across versions, so files die
    * only when the LAST manifest naming them dies) and stale staging
    * debris. Returns (prunedVersions, deletedDataFiles).
    *
    * Single-writer contract applies HARD here: a prune racing an
    * in-flight absorb/maintain would GC the files its staged-but-not-
    * yet-committed manifest references (they are in no committed
    * manifest yet) — the same build-vs-prune exclusion
    * [[IndexStore.pruneVersions]] documents; the scheduler, not the
    * store, serializes them. */
  def prune(spark: SparkSession, root: String, keep: Int)
      : (Seq[Long], Long) = {
    require(keep >= 1, "must keep at least the current version")
    val (fs, p) = IndexStore.fsOf(spark, root)
    val committed = IndexStore.committedVersions(spark, root)
    if (committed.isEmpty) return (Seq.empty, 0L)
    val keepSet = committed.takeRight(keep).toSet
    val doomed = IndexStore.allVersions(spark, root)
      .filter(v => !keepSet.contains(v) && v < committed.last).sorted
    doomed.foreach(v => fs.delete(new Path(p, s"v$v"), true))
    val StagingDir = "^\\.zbuild_v(\\d+)(_.*)?$".r
    fs.listStatus(p).toSeq.filter(_.isDirectory).foreach { s =>
      s.getPath.getName match {
        case StagingDir(n, _) if n.toLong <= committed.last =>
          fs.delete(s.getPath, true)
        case _ =>
      }
    }
    // GC: pool files referenced by NO kept manifest. Paths are
    // relativized against the QUALIFIED root — listFiles returns
    // fully-qualified paths, so stripping a relative root string would
    // relativize NOTHING and this loop would delete every live file
    // (a relative `root` works for init/absorb/read, so the first
    // warning would have been the destroyed store; spec-pinned on a
    // relative root).
    val referenced = keepSet.toSeq.flatMap(v =>
      readManifest(spark, root, v).map(_.path)).toSet
    val dataRoot = new Path(p, "data")
    var deleted = 0L
    if (fs.exists(dataRoot)) {
      val it = fs.listFiles(dataRoot, true)
      val rootUri = fs.makeQualified(p).toUri.getPath.stripSuffix("/")
      while (it.hasNext) {
        val f = it.next().getPath
        val fp = fs.makeQualified(f).toUri.getPath
        // only delete what provably relativizes under the root AND is
        // unreferenced — a path that fails to relativize is left alone
        if (f.getName.endsWith(".parquet") && fp.startsWith(rootUri + "/") &&
            !referenced.contains(fp.stripPrefix(rootUri).stripPrefix("/"))) {
          fs.delete(f, false)
          deleted += 1
        }
      }
      // sweep pool directories holding no parquet anymore (a uuid dir
      // keeps its write-time _SUCCESS marker, so "empty" means "no
      // data files left under it", not literally empty)
      fs.listStatus(dataRoot).filter(_.isDirectory).foreach { u =>
        val it2 = fs.listFiles(u.getPath, true)
        var hasParquet = false
        while (!hasParquet && it2.hasNext)
          hasParquet = it2.next().getPath.getName.endsWith(".parquet")
        if (!hasParquet) fs.delete(u.getPath, true)
      }
    }
    (doomed, deleted)
  }

  // ---------------------------------------------------------------
  // Internals
  // ---------------------------------------------------------------

  /** Key `rows` with the stamped ranks and write one sorted file per
    * touched curve bucket into a fresh pool directory; returns the
    * new manifest entries. The repartition on the bucket column puts
    * each bucket wholly in one task (one output file); the
    * sort-within satisfies FileFormatWriter's partition-column
    * ordering requirement as a PREFIX, so the writer never re-sorts
    * and the intra-file key order survives. Files never span buckets
    * → per-file min/max bounded by the bucket's curve envelope. */
  private def writeDataFiles(rows: DataFrame, meta: ZMeta,
                             root: String): Seq[ZFile] = {
    val spark = rows.sparkSession
    val attempt = java.util.UUID.randomUUID().toString.take(8)
    val dataDir = s"$root/data/$attempt"
    rows
      .withColumn("__zkey",
        ZOrderLayout.zorderKey(rows, meta.cols, meta.ranks, meta.bits))
      .withColumn("__zb", shiftright(col("__zkey"), meta.shift))
      .repartition(col("__zb"))
      .sortWithinPartitions("__zb", "__zkey")
      .drop("__zkey")
      .write.partitionBy("__zb").parquet(dataDir)
    val (fs, _) = IndexStore.fsOf(spark, root)
    val BucketDir = "^__zb=(\\d+)$".r
    fs.listStatus(new Path(dataDir)).toSeq
      .filter(_.isDirectory)
      .flatMap { d =>
        d.getPath.getName match {
          case BucketDir(b) =>
            fs.listStatus(d.getPath).toSeq
              .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
              .map(f => ZFile(
                s"data/$attempt/__zb=$b/${f.getPath.getName}", b.toInt))
          case _ => Seq.empty
        }
      }
  }

  private def deleteFiles(spark: SparkSession, root: String,
                          files: Seq[ZFile]): Unit = {
    val (fs, p) = IndexStore.fsOf(spark, root)
    files.foreach(f => fs.delete(new Path(p, f.path), false))
  }

  /** Publish (meta, manifest) as the next version: both JSON files
    * plus the `_SUCCESS` marker are fully written into an invisible
    * `.zbuild_v<N>_<attempt>` staging dir, then handed to the SHARED
    * [[IndexStore.publishStaged]] arbitration (one copy of the
    * rename-race semantics for both stores). */
  private def publish(spark: SparkSession, root: String, meta: ZMeta,
                      manifest: Seq[ZFile], stats: ZStats): Long = {
    val next = (IndexStore.allVersions(spark, root) :+ 0L).max + 1
    val (fs, p) = IndexStore.fsOf(spark, root)
    val attempt = java.util.UUID.randomUUID().toString.take(8)
    val stagingName = s".zbuild_v${next}_$attempt"
    val staging = new Path(p, stagingName)
    fs.mkdirs(staging)
    writeString(fs, new Path(staging, "_zmeta.json"), metaJson(meta))
    writeString(fs, new Path(staging, "_manifest.json"),
      manifestJson(manifest, stats))
    fs.create(new Path(staging, "_SUCCESS"), true).close()
    IndexStore.publishStaged(fs, p, stagingName, next, root)
  }

  private def writeString(fs: org.apache.hadoop.fs.FileSystem, path: Path,
                          s: String): Unit = {
    val out = fs.create(path, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  private def readString(spark: SparkSession, root: String,
                         rel: String): String = {
    val (fs, p) = IndexStore.fsOf(spark, root)
    val in = fs.open(new Path(p, rel))
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  // JSON via the Jackson shipped with Spark — envelopes carry
  // arbitrary dictionary strings, so hand-rolled escaping is the
  // wrong tool here.
  private val mapper = new ObjectMapper()

  private[graft] def metaJson(meta: ZMeta): String = {
    val o = mapper.createObjectNode()
    val cols = o.putArray("cols"); meta.cols.foreach(cols.add)
    o.put("bits", meta.bits)
    o.put("bucketBits", meta.bucketBits)
    val sc = o.putArray("schemaCols"); meta.schemaCols.foreach(sc.add)
    val st = o.putArray("schemaTypes"); meta.schemaTypes.foreach(st.add)
    val rs = o.putArray("ranks")
    meta.ranks.foreach {
      case ZRank.Width(mn, mx) =>
        val r = rs.addObject(); r.put("type", "width")
        r.put("min", mn); r.put("max", mx)
      case ZRank.Depth(bounds, lo, hi) =>
        val r = rs.addObject(); r.put("type", "depth")
        r.put("lo", lo); r.put("hi", hi)
        val b = r.putArray("bounds"); bounds.foreach(b.add)
      case ZRank.Dict(values) =>
        val r = rs.addObject(); r.put("type", "dict")
        val v = r.putArray("values"); values.foreach(v.add)
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(o)
  }

  private[graft] def parseMeta(json: String): ZMeta = {
    val n = mapper.readTree(json)
    import scala.jdk.CollectionConverters._
    val ranks = n.get("ranks").elements().asScala.map { r =>
      r.get("type").asText() match {
        case "width" => ZRank.Width(r.get("min").asDouble(),
          r.get("max").asDouble()): ZRank
        case "depth" => ZRank.Depth(
          r.get("bounds").elements().asScala.map(_.asDouble()).toSeq,
          r.get("lo").asDouble(), r.get("hi").asDouble())
        case "dict" => ZRank.Dict(
          r.get("values").elements().asScala.map(_.asText()).toSeq)
        case other => throw new IllegalStateException(
          s"unknown rank type '$other' in _zmeta.json")
      }
    }.toSeq
    ZMeta(
      n.get("cols").elements().asScala.map(_.asText()).toSeq,
      n.get("bits").asInt(), n.get("bucketBits").asInt(), ranks,
      n.get("schemaCols").elements().asScala.map(_.asText()).toSeq,
      n.get("schemaTypes").elements().asScala.map(_.asText()).toSeq)
  }

  private[graft] def manifestJson(files: Seq[ZFile], stats: ZStats): String = {
    val o = mapper.createObjectNode()
    o.put("absorbedRows", stats.absorbedRows)
    o.put("oobRows", stats.oobRows)
    val fsArr = o.putArray("files")
    files.foreach { f =>
      val e = fsArr.addObject(); e.put("path", f.path); e.put("bucket", f.bucket)
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(o)
  }

  private[graft] def parseManifest(json: String): (Seq[ZFile], ZStats) = {
    import scala.jdk.CollectionConverters._
    val n = mapper.readTree(json)
    def longOr0(field: String): Long =
      Option(n.get(field)).map(_.asLong()).getOrElse(0L)
    (n.get("files").elements().asScala
      .map(e => ZFile(e.get("path").asText(), e.get("bucket").asInt()))
      .toSeq,
      ZStats(longOr0("absorbedRows"), longOr0("oobRows")))
  }

  private def readMeta(spark: SparkSession, root: String, v: Long): ZMeta =
    parseMeta(readString(spark, root, s"v$v/_zmeta.json"))

  private def readManifest(spark: SparkSession, root: String,
                           v: Long): Seq[ZFile] =
    parseManifest(readString(spark, root, s"v$v/_manifest.json"))._1

  private def statsOf(spark: SparkSession, root: String, v: Long): ZStats =
    parseManifest(readString(spark, root, s"v$v/_manifest.json"))._2
}
