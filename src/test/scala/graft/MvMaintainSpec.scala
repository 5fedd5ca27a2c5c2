package graft

import java.nio.file.Files

import graft.operators.IncrementalAgg
import graft.sources.IndexStore
import graft.streaming.MvMaintain
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming MV maintenance: stream == batch recompute, exactly-once
  * absorb under batch replay, empty-batch no-op. */
class MvMaintainSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("k")
  private val vals = Seq("x")

  private def freshRoot(): String =
    Files.createTempDirectory("graft_mv_").toString + "/state"

  private def rows: Seq[(String, Long)] = Seq(
    ("a", 1L), ("a", 4L), ("b", 10L), ("b", 2L), ("c", 7L),
    ("a", 9L), ("c", 3L))

  test("streamed absorb over 3 micro-batches equals the batch recompute") {
    implicit val sqlCtx = spark.sqlContext
    val root = freshRoot()
    val stream = MemoryStream[(String, Long)]
    val q = stream.toDF().toDF("k", "x")
      .writeStream.foreachBatch(MvMaintain.absorbSink(root, keys, vals) _)
      .start()
    try {
      rows.grouped(3).foreach { chunk =>
        stream.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = MvMaintain.currentReport(spark, root, keys, vals)
      .orderBy("k").collect().toSeq
    val expected = IncrementalAgg.render(keys, vals,
        IncrementalAgg.partials(rows.toDF("k", "x"), keys, vals))
      .orderBy("k").collect().toSeq
    assert(got == expected)
    // one committed version per non-empty micro-batch
    assert(IndexStore.committedVersions(spark, root).size == 3)
  }

  test("a replayed batch id is absorbed exactly once") {
    val root = freshRoot()
    val b0 = rows.take(3).toDF("k", "x")
    MvMaintain.absorbSink(root, keys, vals)(b0, 0L)
    val after1 = MvMaintain.currentReport(spark, root, keys, vals)
      .orderBy("k").collect().toSeq
    val v1 = IndexStore.committedVersions(spark, root)
    // at-least-once delivery: same batch id arrives again (post-crash
    // replay) — a naive absorb would double every sum
    MvMaintain.absorbSink(root, keys, vals)(b0, 0L)
    assert(MvMaintain.currentReport(spark, root, keys, vals)
      .orderBy("k").collect().toSeq == after1)
    assert(IndexStore.committedVersions(spark, root) == v1)
    // the NEXT batch id still absorbs
    MvMaintain.absorbSink(root, keys, vals)(rows.drop(3).toDF("k", "x"), 1L)
    val whole = IncrementalAgg.render(keys, vals,
        IncrementalAgg.partials(rows.toDF("k", "x"), keys, vals))
      .orderBy("k").collect().toSeq
    assert(MvMaintain.currentReport(spark, root, keys, vals)
      .orderBy("k").collect().toSeq == whole)
  }

  test("a batch id BEHIND the stamp fails loudly (fresh checkpoint vs existing state)") {
    // only the last batch ever replays, so batchId < stamp means a
    // query with a FRESH checkpoint (ids restarted at 0) was pointed
    // at an existing state root — ≤-skipping would silently drop every
    // early batch of the new query as "already absorbed"
    val root = freshRoot()
    MvMaintain.absorbSink(root, keys, vals)(rows.take(3).toDF("k", "x"), 5L)
    val before = MvMaintain.currentReport(spark, root, keys, vals)
      .orderBy("k").collect().toSeq
    val e = intercept[IllegalArgumentException] {
      MvMaintain.absorbSink(root, keys, vals)(rows.drop(3).toDF("k", "x"), 0L)
    }
    assert(e.getMessage.contains("behind the committed stamp"))
    // state untouched by the refused absorb
    assert(MvMaintain.currentReport(spark, root, keys, vals)
      .orderBy("k").collect().toSeq == before)
  }

  test("an empty batch commits no version; report before any state fails loudly") {
    val root = freshRoot()
    val e = intercept[IllegalArgumentException] {
      MvMaintain.currentReport(spark, root, keys, vals)
    }
    assert(e.getMessage.contains("no committed index version"))
    MvMaintain.absorbSink(root, keys, vals)(rows.toDF("k", "x").limit(0), 0L)
    assert(IndexStore.committedVersions(spark, root).isEmpty)
    assert(MvMaintain.lastAbsorbedBatch(spark, root) == -1L)
  }
}
