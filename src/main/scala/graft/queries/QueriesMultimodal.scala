package graft

import graft.functions.{TextAnalysis, TextFunctions, VectorFunctions}
import graft.multimodal.{DecodeStub, Multimodal}
import graft.operators.{Ann, Bm25, Chunker, Curation, Dedup, HeavyHitters, Knn, LshAnn, Mmr, MultiStageSearch, Packing, QualityModel, Rerank, RetrievalEval}
import graft.sources.JobCorpus
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal plumbing: opaque binary + typed metadata; decode is an
  * external boundary (stubbed deterministically — see DecodeStub).
  */
private[graft] trait QueriesMultimodal { self: QueriesShared =>


  private val m1 = QuerySpec("m1_multimodal_meta",
    (s, d) => t(s, d, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("content"))
      .select(col("doc_id"),
        octet_length(col("content")).as("n_bytes"),
        substring(md5(col("content").cast("string")), 1, 16).as("content_key"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id, octet_length(text::BLOB) AS n_bytes,
      substr(md5(text), 1, 16) AS content_key
      FROM documents ORDER BY doc_id"""))

  // ======================================================================
  // Round-2 coverage: A3 audit, P9/P12 projections, A9 padding, A6/A10
  // rerank, sliding windows (streaming's batch twin), IVF ANN scale
  // path, per-language term profiles, multimodal frame plumbing, and
  // the P7/P8/F3 JSON round trip.
  // ======================================================================


  private val m2 = QuerySpec("m2_multimodal_frames",
    // Multimodal frame sampling: payload → ≤4 fixed-size frames with
    // typed metadata + content keys (decode itself is the stubbed
    // external boundary — graft.multimodal.DecodeStub).
    (s, d) => {
      val frames = Multimodal.sampleFrames(
        t(s, d, "documents").select(col("doc_id"), col("text").as("payload")),
        "doc_id", "payload", frameSize = 256, maxFrames = 4)
      Multimodal.frameMeta(frames)
        .select(col("doc_id"), col("frame_index"), col("frame_chars"), col("frame_key"))
        .orderBy("doc_id", "frame_index")
    },
    Some("""WITH f AS (SELECT doc_id,
        unnest(range(0, least(CAST(ceil(len(text) / 256.0) AS INT), 4))) AS frame_index,
        text FROM documents)
      SELECT doc_id, frame_index,
        len(substr(text, frame_index * 256 + 1, 256)) AS frame_chars,
        substr(md5(substr(text, frame_index * 256 + 1, 256)), 1, 16) AS frame_key
      FROM f ORDER BY doc_id, frame_index"""))


  private val m3 = QuerySpec("m3_frame_features",
    // The multimodal pipeline END: frames → content keys → decoded
    // feature vectors (DecodeStub — deterministic hex arithmetic
    // standing in for codec+embed, so the whole path stays
    // oracle-checkable) → per-frame feature columns. Composes m2's
    // frame sampling with the decode boundary.
    (s, d) => {
      val frames = Multimodal.sampleFrames(
        t(s, d, "documents").select(col("doc_id"), col("text").as("payload")),
        "doc_id", "payload", frameSize = 256, maxFrames = 4)
      Multimodal.frameMeta(frames)
        .select(col("doc_id"), col("frame_index"),
          DecodeStub.features(col("frame_key")).as("f"))
        .select((Seq(col("doc_id"), col("frame_index")) ++
          (0 until 4).map(i =>
            round(element_at(col("f"), i + 1), 6).as(s"f$i"))): _*)
        .orderBy("doc_id", "frame_index")
    },
    Some {
      def hex4(p: Int): String = (0 until 4).map { k =>
        s"(strpos('0123456789abcdef', substr(fk, ${p + k}, 1)) - 1) * ${math.pow(16, 3 - k).toLong}"
      }.mkString(" + ")
      val feats = (0 until 4)
        .map(i => s"round((${hex4(i * 4 + 1)}) / 65535.0, 6) AS f$i")
        .mkString(", ")
      s"""WITH f AS (SELECT doc_id,
          unnest(range(0, least(CAST(ceil(len(text) / 256.0) AS INT), 4))) AS frame_index,
          text FROM documents),
        keys AS (SELECT doc_id, frame_index,
          substr(md5(substr(text, frame_index * 256 + 1, 256)), 1, 16) AS fk
          FROM f)
      SELECT doc_id, frame_index, $feats
      FROM keys ORDER BY doc_id, frame_index"""
    })


  private val m4 = QuerySpec("m4_frame_dedup",
    // Multimodal dedup ACTION: payload pairs whose distinct frame-key
    // sets overlap at Jaccard ≥ 0.5 (perceptual-hash dedup with the
    // content hash standing in at the decode boundary). Frame-keyed
    // join — never all-pairs; maxFrameDf caps boilerplate frames.
    (s, d) => Multimodal.frameDedupPairs(
        t(s, d, "documents").select(col("doc_id"), col("text").as("payload")),
        "doc_id", "payload", frameSize = 256, maxFrames = 4,
        threshold = 0.5, maxFrameDf = 50)
      .orderBy("doc_a", "doc_b"),
    Some("""WITH f AS (SELECT doc_id,
        unnest(range(0, least(CAST(ceil(len(text) / 256.0) AS INT), 4))) AS fi,
        text FROM documents),
      keys AS (SELECT DISTINCT doc_id,
        substr(md5(substr(text, fi * 256 + 1, 256)), 1, 16) AS frame_key
        FROM f),
      rare AS (SELECT frame_key FROM keys GROUP BY frame_key
        HAVING count(*) <= 50),
      kept AS (SELECT k.* FROM keys k JOIN rare USING (frame_key)),
      sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
      pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          count(*) AS n_shared
        FROM kept a JOIN kept b
          ON a.frame_key = b.frame_key AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT doc_a, doc_b, n_shared,
        round(CAST(n_shared AS DOUBLE) / (na.n + nb.n - n_shared), 6) AS jaccard
      FROM pairs JOIN sizes na ON doc_a = na.doc_id
        JOIN sizes nb ON doc_b = nb.doc_id
      WHERE round(CAST(n_shared AS DOUBLE) / (na.n + nb.n - n_shared), 6) >= 0.5
      ORDER BY doc_a, doc_b"""))

  final def queriesMultimodal: Seq[QuerySpec] = Seq(m1, m2, m3, m4)
}
