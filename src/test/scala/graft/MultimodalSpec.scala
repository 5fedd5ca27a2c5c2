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

  test("frameDedupPairs finds payloads sharing frame signatures, caps boilerplate") {
    val A = "a" * 256; val B = "b" * 256; val C = "c" * 256; val D = "d" * 256
    val df = Seq(
      (1L, A + B),       // frames {A,B}
      (2L, A + B),       // exact frame twin of 1 → jaccard 1.0
      (3L, A + C),       // shares A with 1,2 → jaccard 1/3 < 0.5
      (4L, C + D),       // shares C with 3 → 1/3 < 0.5
      (5L, "")           // no frames, never pairs
    ).toDF("doc_id", "payload")
    val got = Multimodal.frameDedupPairs(df, "doc_id", "payload",
        frameSize = 256, maxFrames = 4, threshold = 0.5)
      .orderBy("doc_a", "doc_b")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 2L, 1.0)))
    // lower threshold surfaces the single-frame overlaps
    val loose = Multimodal.frameDedupPairs(df, "doc_id", "payload",
        frameSize = 256, maxFrames = 4, threshold = 0.3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(loose == Set((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)))
    // cap at 2: frame A (in 3 payloads) is dropped as boilerplate —
    // 1↔2 still pair on B alone (capped sets: {B} vs {B} → 1.0),
    // 1↔3/2↔3 lose their only shared key
    val capped = Multimodal.frameDedupPairs(df, "doc_id", "payload",
        frameSize = 256, maxFrames = 4, threshold = 0.3, maxFrameDf = 2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped == Set((1L, 2L), (3L, 4L)))
  }

  test("property: frameDedupPairs equals brute-force Jaccard of frame sets (no cap)") {
    import org.scalacheck.Gen
    // payloads built from a 4-symbol frame alphabet so overlaps are common
    val frameGen = Gen.oneOf("A", "B", "C", "D").map(_ * 8)
    val gen = for {
      n <- Gen.choose(2, 8)
      docs <- Gen.listOfN(n, Gen.choose(0, 3).flatMap(m => Gen.listOfN(m, frameGen)))
      thr <- Gen.oneOf(0.3, 0.5, 1.0)
    } yield (docs.zipWithIndex.map { case (fs, i) => (i.toLong, fs.mkString) }, thr)
    PropHelper.forAll(gen, n = 15) { case (docs, thr) =>
      val got = Multimodal.frameDedupPairs(docs.toDF("doc_id", "payload"),
          "doc_id", "payload", frameSize = 8, maxFrames = 4, threshold = thr)
        .select("doc_a", "doc_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      val sets = docs.map { case (id, p) => id -> p.grouped(8).toSet }.toMap
      val want = (for {
        (a, sa) <- sets; (b, sb) <- sets
        if a < b && sa.nonEmpty && sb.nonEmpty
        j = (sa & sb).size.toDouble / (sa ++ sb).size if j >= thr
      } yield (a, b, BigDecimal(j).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
      assert(got == want, s"docs=$docs thr=$thr")
    }
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
