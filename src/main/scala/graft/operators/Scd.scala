package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type-2 merge (Kimball): reconcile the
  * CURRENT rows of a versioned dimension with a fresh full snapshot,
  * emitting per key one of four outcomes — unchanged (row kept),
  * changed (old row closed at `batchDate`, new row opened), deleted
  * (closed), inserted (opened) — while historical (already-closed)
  * rows pass through untouched. The warehouse upsert every dim
  * pipeline runs; d22's snapshot diff is the detect-only half, this
  * is the apply.
  *
  * Change detection hashes the tracked attributes: md5 over a
  * 0x01-joined string render with 0x00 standing in for null — the
  * engine-portable form the DuckDB oracle replays byte-for-byte
  * (chr(1)/chr(0)); track money/decimals as integer cents, not
  * doubles, so the string render can never diverge between engines.
  *
  * 100 TB shape: the full-outer status join ships (key, 16-byte hash)
  * pairs only — never attribute payloads; each output leg is a
  * key-keyed LEFT-SEMI join against its status keys, so attributes
  * cross the wire exactly once, in the leg that emits them. All five
  * exchanges hash on the same key, so AQE/exchange-reuse co-locates
  * them, and per-key output is ≤ 2 rows (closed + opened) plus
  * history.
  */
object Scd {

  private def changeHash(tracked: Seq[String]) =
    md5(concat_ws("\u0001",
      tracked.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*))

  /** `dim` carries key + tracked + (valid_from, valid_to, is_current);
    * `snapshot` carries key + tracked. `batchDate` stamps closes and
    * opens. Output schema = dim's. */
  def scd2Merge(dim: DataFrame, snapshot: DataFrame, keyCol: String,
                tracked: Seq[String], batchDate: String): DataFrame = {
    require(tracked.nonEmpty, "tracked attribute list must be non-empty")
    val meta = Seq("valid_from", "valid_to", "is_current")
    (meta :+ keyCol).foreach(c => require(dim.columns.contains(c),
      s"dim is missing required column $c"))
    require(snapshot.columns.contains(keyCol), s"snapshot missing $keyCol")
    meta.foreach(c => require(!snapshot.columns.contains(c),
      s"snapshot must not carry SCD metadata column $c"))

    // Stamp closes/opens in the dim's OWN validity types: a bare
    // string lit would let unionByName silently coerce a DATE-typed
    // dim's whole valid_from/valid_to columns to string ("output
    // schema = dim's" would be broken exactly where it matters).
    val vfType = dim.schema("valid_from").dataType
    val vtType = dim.schema("valid_to").dataType
    val batchFrom = lit(batchDate).cast(vfType)
    val batchTo = lit(batchDate).cast(vtType)

    val cur = dim.filter(col("is_current"))
    val hist = dim.filter(!col("is_current"))
    val oldKeys = cur.select(col(keyCol), changeHash(tracked).as("__oh"))
    val newKeys = snapshot.select(col(keyCol), changeHash(tracked).as("__nh"))
    // (key, hash)-only full outer: the one corpus-wide comparison,
    // 16-byte payloads
    val status = oldKeys.join(newKeys, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("__nh").isNull, lit("deleted"))
          .when(col("__oh").isNull, lit("inserted"))
          .when(col("__oh") === col("__nh"), lit("unchanged"))
          .otherwise(lit("changed")).as("__st"))
    def keysWhere(sts: String*) =
      status.filter(col("__st").isin(sts: _*)).select(keyCol)
    val kept = cur.join(keysWhere("unchanged"), Seq(keyCol), "left_semi")
    val closed = cur.join(keysWhere("changed", "deleted"), Seq(keyCol), "left_semi")
      .withColumn("valid_to", batchTo)
      .withColumn("is_current", lit(false))
    val opened = snapshot
      .join(keysWhere("changed", "inserted"), Seq(keyCol), "left_semi")
      .withColumn("valid_from", batchFrom)
      .withColumn("valid_to", lit(null).cast(vtType))
      .withColumn("is_current", lit(true))
    hist.unionByName(kept).unionByName(closed)
      .unionByName(opened.select(dim.columns.map(col): _*))
  }
}
