package graft

import graft.multimodal.{DecodeStub, Multimodal}
import org.apache.spark.sql.functions._

/** Multimodal plumbing: frame sampling shape + deterministic decode stub. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("sampleFrames: sizes, count cap, and index order") {
    val df = Seq((1L, "a" * 700), (2L, "b" * 100), (3L, ""))
      .toDF("doc_id", "payload")
    val frames = Multimodal.sampleFrames(df, "doc_id", "payload", 256, 4)
      .orderBy("doc_id", "frame_index")
      .select(col("doc_id"), col("frame_index"), length(col("frame")).as("len"))
      .as[(Long, Int, Int)].collect().toSeq
    // doc 1: 700 chars → 3 frames (256, 256, 188); doc 2: 1; doc 3: none
    assert(frames == Seq(
      (1L, 0, 256), (1L, 1, 256), (1L, 2, 188), (2L, 0, 100)))
  }

  test("frame cap: a huge payload yields exactly maxFrames frames") {
    val df = Seq((1L, "x" * 10000)).toDF("doc_id", "payload")
    val n = Multimodal.sampleFrames(df, "doc_id", "payload", 256, 4).count()
    assert(n == 4)
  }

  test("frameMeta adds byte length and a stable 16-hex content key") {
    val df = Seq((1L, "hello world")).toDF("doc_id", "payload")
    val out = Multimodal.frameMeta(
        Multimodal.sampleFrames(df, "doc_id", "payload", 256, 4))
      .select("frame_chars", "frame_key").as[(Int, String)].head()
    assert(out._1 == 11)
    assert(out._2.matches("[0-9a-f]{16}"))
  }

  test("DecodeStub features are deterministic and in [0,1]") {
    val df = Seq(("00ff10a0deadbeef"), ("00ff10a0deadbeef")).toDF("frame_key")
    val feats = df.select(DecodeStub.features(col("frame_key")))
      .as[Seq[Double]].collect()
    assert(feats(0) == feats(1))
    assert(feats(0).length == 4)
    assert(feats(0).forall(v => v >= 0.0 && v <= 1.0))
  }
}
