package graft

import graft.operators.IncrementalAgg
import org.apache.spark.sql.DataFrame

/** Incremental MV maintenance: merge ≡ recompute for any batch
  * boundary, null/empty-state handling, loud schema guard. */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("k")
  private val vals = Seq("x", "y")

  // integer-valued metrics → merge must be BIT-exact (the operator's
  // documented contract for exact columns; fp columns inherit the
  // usual fold-order caveat and are not asserted bit-wise here)
  private def rows: Seq[(String, java.lang.Long, java.lang.Long)] = Seq(
    ("a", 1L, 10L), ("a", 2L, null), ("a", 3L, 30L),
    ("b", 5L, 50L), ("b", null, 70L),
    ("c", null, null))
  private def df(r: Seq[(String, java.lang.Long, java.lang.Long)]): DataFrame =
    r.toDF("k", "x", "y")

  private def rendered(d: DataFrame): Seq[org.apache.spark.sql.Row] =
    IncrementalAgg.render(keys, vals,
      IncrementalAgg.partials(d, keys, vals)).orderBy("k").collect().toSeq

  test("merge of split states equals recompute, for every 2-way split point") {
    val whole = rendered(df(rows))
    (0 to rows.length).foreach { cut =>
      val (l, r) = rows.splitAt(cut)
      val merged = IncrementalAgg.render(keys, vals,
          IncrementalAgg.merge(keys, vals,
            Seq(IncrementalAgg.partials(df(l), keys, vals),
              IncrementalAgg.partials(df(r), keys, vals))))
        .orderBy("k").collect().toSeq
      assert(merged == whole, s"cut=$cut")
    }
  }

  test("merge is order-insensitive and absorbs an empty delta") {
    val (l, r) = rows.splitAt(2)
    val sl = IncrementalAgg.partials(df(l), keys, vals)
    val sr = IncrementalAgg.partials(df(r), keys, vals)
    val empty = IncrementalAgg.partials(df(rows).limit(0), keys, vals)
    val ab = IncrementalAgg.render(keys, vals,
      IncrementalAgg.merge(keys, vals, Seq(sl, sr, empty)))
      .orderBy("k").collect().toSeq
    val ba = IncrementalAgg.render(keys, vals,
      IncrementalAgg.merge(keys, vals, Seq(empty, sr, sl)))
      .orderBy("k").collect().toSeq
    assert(ab == ba && ab == rendered(df(rows)))
  }

  test("all-null group renders null avg/min/max and zero count, never NaN") {
    val out = rendered(df(rows)).find(_.getString(0) == "c").get
    // columns: k, sum_x, cnt_x, avg_x, min_x, max_x, sum_y, ...
    assert(out.isNullAt(1) && out.getLong(2) == 0L && out.isNullAt(3) &&
      out.isNullAt(4) && out.isNullAt(5))
  }

  test("merge rejects a state missing its columns, loudly") {
    val good = IncrementalAgg.partials(df(rows), keys, vals)
    val bad = good.drop("min_x")
    val e = intercept[IllegalArgumentException] {
      IncrementalAgg.merge(keys, vals, Seq(good, bad))
    }
    assert(e.getMessage.contains("min_x"))
  }
}
