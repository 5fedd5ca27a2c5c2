package graft

import graft.operators.Scd
import org.apache.spark.sql.functions._

/** SCD Type-2 merge: four outcomes, history passthrough, null
  * sentinel semantics, loud contract guards. */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def dim = Seq(
    (1L, "alice", 100L, "2020-01-01", Option.empty[String], true),
    (2L, "bob", 200L, "2020-01-01", Option.empty[String], true),
    (3L, "carol", 300L, "2020-01-01", Option.empty[String], true),
    (9L, "old-hist", 900L, "2018-01-01", Option("2019-01-01"), false)
  ).toDF("id", "name", "bal", "valid_from", "valid_to", "is_current")

  // 1 unchanged, 2 changed, 3 absent (deleted), 4 inserted
  private def snap = Seq(
    (1L, "alice", 100L), (2L, "bob", 250L), (4L, "dave", 400L)
  ).toDF("id", "name", "bal")

  test("scd2Merge emits all four outcomes and passes history through") {
    val out = Scd.scd2Merge(dim, snap, "id", Seq("name", "bal"), "2026-01-01")
      .orderBy("id", "is_current")
      .select("id", "name", "bal", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, String, Option[String], Boolean)]
      .collect().toSeq
    assert(out == Seq(
      (1L, "alice", 100L, "2020-01-01", None, true),
      (2L, "bob", 200L, "2020-01-01", Some("2026-01-01"), false),
      (2L, "bob", 250L, "2026-01-01", None, true),
      (3L, "carol", 300L, "2020-01-01", Some("2026-01-01"), false),
      (4L, "dave", 400L, "2026-01-01", None, true),
      (9L, "old-hist", 900L, "2018-01-01", Some("2019-01-01"), false)))
  }

  test("null tracked values hash via the sentinel: null==null is unchanged, null!=value is changed") {
    val d0 = Seq((1L, Option.empty[String], "2020-01-01",
        Option.empty[String], true))
      .toDF("id", "name", "valid_from", "valid_to", "is_current")
    val same = Scd.scd2Merge(d0,
      Seq((1L, Option.empty[String])).toDF("id", "name"),
      "id", Seq("name"), "2026-01-01")
    assert(same.count() == 1 && same.filter(col("is_current")).count() == 1)
    val diff = Scd.scd2Merge(d0,
      Seq((1L, Option("x"))).toDF("id", "name"),
      "id", Seq("name"), "2026-01-01")
    assert(diff.count() == 2)
    assert(diff.filter(!col("is_current"))
      .select("valid_to").as[String].head() == "2026-01-01")
  }

  test("scd2Merge is idempotent: re-merging the same snapshot changes nothing") {
    // after one merge the dim agrees with the snapshot (closed rows are
    // history, current rows match), so a second merge at a LATER batch
    // date must emit byte-identical rows — the property that makes a
    // retried daily job harmless
    val cols = Seq("id", "name", "bal", "valid_from", "valid_to", "is_current")
    val once = Scd.scd2Merge(dim, snap, "id", Seq("name", "bal"), "2026-01-01")
    val again = Scd.scd2Merge(once, snap, "id", Seq("name", "bal"), "2026-02-01")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id", "is_current", "valid_from")
        .select(cols.head, cols.tail: _*)
        .as[(Long, String, Long, String, Option[String], Boolean)]
        .collect().toSeq
    assert(rows(again) == rows(once))
  }

  test("DATE-typed validity columns keep their types; stamps parse as dates") {
    // a bare string lit for valid_from/valid_to would let unionByName
    // coerce the whole DATE column to string — "output schema = dim's"
    // must hold for typed validity columns too
    val dDim = dim
      .withColumn("valid_from", col("valid_from").cast("date"))
      .withColumn("valid_to", col("valid_to").cast("date"))
    val out = Scd.scd2Merge(dDim, snap, "id", Seq("name", "bal"), "2026-01-01")
    assert(out.schema("valid_from").dataType ==
      org.apache.spark.sql.types.DateType)
    assert(out.schema("valid_to").dataType ==
      org.apache.spark.sql.types.DateType)
    val stamped = out.filter(!col("is_current") && col("id") === 2L)
      .select(col("valid_to").cast("string")).as[String].collect().toSeq
    assert(stamped == Seq("2026-01-01"))
    // opened rows: typed null valid_to, typed date valid_from
    val openedRow = out.filter(col("is_current") && col("id") === 4L)
      .select(col("valid_from").cast("string"), col("valid_to").isNull)
      .as[(String, Boolean)].collect().toSeq
    assert(openedRow == Seq(("2026-01-01", true)))
  }

  test("guards: missing dim metadata and metadata-bearing snapshot fail loudly") {
    intercept[IllegalArgumentException] {
      Scd.scd2Merge(dim.drop("is_current"), snap, "id", Seq("name"), "2026-01-01")
    }
    intercept[IllegalArgumentException] {
      Scd.scd2Merge(dim, snap.withColumn("is_current", lit(true)),
        "id", Seq("name"), "2026-01-01")
    }
    intercept[IllegalArgumentException] {
      Scd.scd2Merge(dim, snap, "id", Seq.empty, "2026-01-01")
    }
  }
}
