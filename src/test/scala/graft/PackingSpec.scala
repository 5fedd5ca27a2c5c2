package graft

import graft.operators.{Curation, Packing}
import org.apache.spark.sql.functions._

/** concatChunk vs a driver-side replay of the same (bucket, md5, id)
  * global order — the bucketed two-phase prefix sum must equal the
  * naive sequential cumsum exactly. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }
  private def bucketOf(id: Long, buckets: Int): Long =
    java.lang.Long.parseLong(md5hex(id.toString).take(8), 16) % buckets

  test("start_tok equals the sequential cumsum over (bucket, md5, id) order") {
    val docs = (0L until 200L).map(i => (i, (i * 37 % 90).toInt)).toDF("id", "ntok")
    val got = Packing.concatChunk(docs, "id", "ntok", seqLen = 64, buckets = 8)
      .select("id", "start_tok").as[(Long, Long)].collect().toMap
    val ordered = (0L until 200L).sortBy(i => (bucketOf(i, 8), md5hex(i.toString), i))
    var cum = 0L
    ordered.foreach { i =>
      assert(got(i) == cum, s"id=$i")
      cum += (i * 37 % 90)
    }
    assert(cum == (0L until 200L).map(i => i * 37 % 90).sum)
  }

  test("seq ids are the floor-division of the token span; empty docs span 0") {
    val docs = Seq((1L, 10), (2L, 0), (3L, 500), (4L, 64)).toDF("id", "ntok")
    val rows = Packing.concatChunk(docs, "id", "ntok", seqLen = 64, buckets = 4)
      .select("id", "n_tokens", "start_tok", "first_seq", "last_seq", "n_seqs")
      .as[(Long, Long, Long, Long, Long, Int)].collect()
    rows.foreach { case (id, n, start, first, last, nseqs) =>
      assert(first == start / 64, s"id=$id")
      if (n > 0) {
        assert(last == (start + n - 1) / 64, s"id=$id")
        assert(nseqs == (last - first + 1), s"id=$id")
      } else {
        assert(last == first && nseqs == 0, s"id=$id")
      }
    }
    // the 500-token doc must straddle at least 8 sequences of 64
    val big = rows.find(_._1 == 3L).get
    assert(big._6 >= 8)
  }

  test("deterministic across runs and partition layouts") {
    val docs = (0L until 100L).map(i => (i, (i % 13).toInt)).toDF("id", "ntok")
    val a = Packing.concatChunk(docs, "id", "ntok", 32, 8)
      .orderBy("id").collect().toSeq
    val b = Packing.concatChunk(docs.repartition(7), "id", "ntok", 32, 8)
      .orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("the big cumsum window is bucket-partitioned, not global") {
    val docs = (0L until 50L).map(i => (i, 5)).toDF("id", "ntok")
    val plan = Packing.concatChunk(docs, "id", "ntok", 64, 16)
      .queryExecution.executedPlan.toString
    // the per-bucket window must partition by the bucket column; only
    // the 16-row offset window may be single-partition
    assert(plan.contains("__b"), plan)
  }

  test("property: packing is a gapless exact cover of the token stream") {
    import org.scalacheck.Gen
    val gen = for {
      n <- Gen.choose(1, 60)
      toks <- Gen.listOfN(n, Gen.choose(0, 40))
      seqLen <- Gen.choose(1, 17)
      buckets <- Gen.oneOf(1, 3, 8)
    } yield (toks, seqLen, buckets)
    PropHelper.forAll(gen, n = 25) { case (toks, seqLen, buckets) =>
      val docs = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "ntok")
      val rows = Packing.concatChunk(docs, "id", "ntok", seqLen, buckets)
        .select("id", "n_tokens", "start_tok", "first_seq", "last_seq")
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._3)
      // exact cover: sorted starts are the exclusive prefix sums
      var cum = 0L
      rows.foreach { case (id, n, start, first, last) =>
        assert(start == cum, s"id=$id")
        assert(first == start / seqLen)
        if (n > 0) assert(last == (start + n - 1) / seqLen)
        cum += n
      }
      assert(cum == toks.map(_.toLong).sum)
    }
  }

  test("a null id fails loudly instead of silently diverging the order") {
    val df = Seq((Option(1L), 5L), (Option.empty[Long], 3L)).toDF("id", "ntok")
    val e = intercept[Exception] {
      Packing.concatChunk(df, "id", "ntok", seqLen = 8).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("must be non-null")), msgs(e).mkString(" | "))
  }

  test("bucket derivation matches Curation.hashBucket") {
    val ids = (0L until 64L).toDF("id")
    val sparkSide = ids.select(col("id"), Curation.hashBucket(col("id"), 64).as("b"))
      .as[(Long, Long)].collect().toMap
    (0L until 64L).foreach(i => assert(sparkSide(i) == bucketOf(i, 64), s"id=$i"))
  }
}
