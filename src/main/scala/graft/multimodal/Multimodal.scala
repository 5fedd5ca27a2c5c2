package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal columns (north star beyond the reference): image/audio/
  * video payloads as opaque `binary` columns with typed metadata.
  *
  * The engine-side plumbing — schema, frame sampling, batch shape,
  * partitioning — is real and oracle-tested; the actual media DECODE is
  * an external boundary exactly like the LLM calls (the codec libraries
  * are not part of the engine), stubbed behind [[DecodeStub]] with a
  * deterministic fake so pipelines through it stay reproducible.
  */
object Multimodal {

  /** Sample up to `maxFrames` fixed-size frames from a payload column —
    * the columnar skeleton of video frame-sampling / audio windowing.
    * Pure built-ins (sequence + transform), fully codegen'd; 1 row →
    * ≤maxFrames rows via posexplode. */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
                   frameSize: Int, maxFrames: Int): DataFrame = {
    // coalesce: least() SKIPS nulls, so a NULL payload would otherwise
    // yield nFrames = maxFrames (maxFrames rows of null frames) instead
    // of the empty output degenerate payloads are documented to produce.
    val nFrames = least(
      ceil(coalesce(length(col(payloadCol)), lit(0)).cast("double") / frameSize).cast("int"),
      lit(maxFrames))
    // guard: sequence(0, -1) would DESCEND, not produce an empty array.
    // The empty branch is slice(array(<one frame>), 1, 0) rather than a
    // hard-cast array<string>: it inherits the payload's element type
    // (string OR binary), so binary payloads aren't coerced to string.
    val oneFrame = substring_index_safe(col(payloadCol), lit(0), frameSize)
    val frames = when(nFrames > 0,
      transform(
        sequence(lit(0), nFrames - 1),
        i => substring_index_safe(col(payloadCol), i, frameSize)))
      .otherwise(slice(array(oneFrame), 1, 0))
    df.select(col(idCol), posexplode(frames).as(Seq("frame_index", "frame")))
  }

  private def substring_index_safe(payload: Column, i: Column, frameSize: Int): Column =
    payload.substr(i * frameSize + 1, lit(frameSize))

  /** Typed metadata + content key per frame (the join key for decoded
    * features): `frame_chars` (character count for string payloads; for
    * binary payloads Spark's `length` returns the BYTE count, so
    * frame_chars == frame_bytes there — the distinction only matters
    * for multi-byte string frames), `frame_bytes` (byte size — the
    * right measure for binary media), and a 16-hex content hash. */
  def frameMeta(frames: DataFrame): DataFrame =
    frames.select(
      col("*"),
      length(col("frame")).as("frame_chars"),
      length(col("frame").cast("binary")).as("frame_bytes"),
      substring(md5(col("frame").cast("binary")), 1, 16).as("frame_key"))
}

/** External decode boundary. A production impl would run a codec per
  * partition (batched, arrow-shaped); the engine ships a DETERMINISTIC
  * stub so downstream operators (dedup on frame features, similarity
  * on frame embeddings) are testable without codec libraries. */
object DecodeStub {
  /** Fake "feature vector" for a frame: 4 stable pseudo-features
    * derived from the content hash — stands in for decode+embed. */
  def features(frameKey: Column): Column =
    array((0 until 4).map { i =>
      (conv(substring(frameKey, i * 4 + 1, 4), 16, 10).cast("double") / 65535.0)
    }: _*)
}
