package graft

import java.nio.file.Files

import graft.sources.ZOrderLayout
import org.apache.spark.sql.functions._

/** Z-order layout: the Morton key's bit algebra, row identity across
  * the rewrite, and the property the layout exists for — per-file
  * min/max spans shrink on EVERY interleaved dimension, which is what
  * parquet row-group statistics prune by. */
class ZOrderLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorderKey interleaves column ranks bit by bit") {
    // 2 cols, bits=2, values spanning [0, 3] with 4 buckets → the
    // rank IS the value; key = y1 x1 y0 x0 (col 0 owns even bits)
    val df = Seq((0.0, 0.0), (3.0, 0.0), (0.0, 3.0), (3.0, 3.0),
      (1.0, 2.0)).toDF("x", "y")
    val stats = ZOrderLayout.columnStats(df, Seq("x", "y"))
    assert(stats == Seq((0.0, 3.0), (0.0, 3.0)))
    val got = df.select(
        col("x"), col("y"),
        ZOrderLayout.zorderKey(Seq("x", "y"), stats, bits = 2).as("z"))
      .as[(Double, Double, Long)].collect().map(r => (r._1, r._2) -> r._3)
      .toMap
    // hand-interleaved: x=1,y=2 → x bits 01, y bits 10 → z = 1001b = 9
    assert(got((0.0, 0.0)) == 0L)
    assert(got((3.0, 0.0)) == 5L)   // x=11 on even bits: 0101b
    assert(got((0.0, 3.0)) == 10L)  // y=11 on odd bits: 1010b
    assert(got((3.0, 3.0)) == 15L)
    assert(got((1.0, 2.0)) == 9L)
    // nulls and degenerate columns rank 0, never throw
    val withNull = Seq((Some(1.0), 5.0), (None, 5.0)).toDF("x", "y")
    val s2 = ZOrderLayout.columnStats(withNull, Seq("x", "y"))
    assert(s2(1) == (5.0, 5.0)) // degenerate y
    val z2 = withNull.select(
        ZOrderLayout.zorderKey(Seq("x", "y"), s2, bits = 2).as("z"))
      .as[Long].collect()
    assert(z2.forall(_ >= 0))
    intercept[IllegalArgumentException] {
      ZOrderLayout.zorderKey(Seq("x", "y"), s2, bits = 40) // 80 bits > 62
    }
    intercept[IllegalArgumentException] {
      ZOrderLayout.zorderKey(Seq.empty, Seq.empty, bits = 2)
    }
  }

  test("writeZOrdered preserves rows exactly and shrinks per-file spans on BOTH dimensions") {
    // a 60x60 grid, arriving in hash-scattered order (the realistic
    // ingest shape: no natural clustering at all)
    val grid = spark.range(3600).select(
      (col("id") % 60).cast("double").as("x"),
      (col("id") / 60).cast("double").as("y"),
      col("id").as("rid")).repartition(16)
    val dZ = Files.createTempDirectory("graft_zorder").toString + "/t"
    ZOrderLayout.writeZOrdered(grid, Seq("x", "y"), dZ, nFiles = 16)
    val back = spark.read.parquet(dZ)
    // row identity: the layout is invisible in the data
    assert(back.count() == 3600)
    assert(back.select("rid").as[Long].collect().toSet ==
      (0L until 3600L).toSet)
    assert(back.columns.sorted.toSeq == Seq("rid", "x", "y"))
    // span audit: mean per-file (max-min) on each dimension. The
    // scattered layout makes every file span ~the full range; the
    // Z-order layout assigns each file a contiguous curve segment, so
    // both dimensions' spans shrink together — the min/max statistics
    // parquet row-group pruning feeds on. (A single-column sort would
    // shrink one dimension and leave the other at full span.)
    val dP = Files.createTempDirectory("graft_plain").toString + "/t"
    grid.write.parquet(dP)
    def meanSpan(path: String, c: String): Double = {
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name()).agg((max(col(c)) - min(col(c))).as("s"))
        .select("s").as[Double].collect()
      spans.sum / spans.length
    }
    val (zx, zy) = (meanSpan(dZ, "x"), meanSpan(dZ, "y"))
    val (px, py) = (meanSpan(dP, "x"), meanSpan(dP, "y"))
    assert(zx < px / 2, s"x span $zx vs scattered $px")
    assert(zy < py / 2, s"y span $zy vs scattered $py")
    // loud guards
    intercept[IllegalArgumentException] {
      ZOrderLayout.writeZOrdered(grid, Seq("nope"), dZ, 4)
    }
    intercept[IllegalArgumentException] {
      ZOrderLayout.writeZOrdered(grid, Seq("x"), dZ, 0)
    }
  }
}
