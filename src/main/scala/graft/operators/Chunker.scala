package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** G1: faithful reimplementation of LangChain's
  * `RecursiveCharacterTextSplitter` as configured by the reference
  * (size=300, overlap=50, default separators —
  * /root/reference/build_vectorstore.py:50-53, applied at :197).
  *
  * Semantics matter: chunk boundaries define every downstream id and
  * count (SURVEY.md §7 "hard parts" #1). Algorithm reproduced from the
  * published LangChain splitter behavior: try separators in order
  * ("\n\n", "\n", " ", ""), keep the separator attached to the piece
  * that follows it, greedily merge pieces up to `chunkSize`, and carry
  * a sliding overlap of up to `overlap` chars into the next chunk;
  * each emitted chunk is trimmed and empties are dropped. Lengths are
  * counted in Java chars (UTF-16 code units) — identical to Python
  * code points for all BMP text incl. Korean.
  */
final case class Chunker(
    chunkSize: Int = 300,
    overlap: Int = 50,
    separators: Seq[String] = Seq("\n\n", "\n", " ", "")) {
  require(chunkSize > 0, "chunkSize must be positive")
  require(overlap < chunkSize, "overlap must be smaller than chunkSize")

  /** Split `text` into chunks. Deterministic, pure. */
  def split(text: String): Seq[String] =
    if (text == null) Seq.empty else splitRec(text, separators)

  private def splitRec(text: String, seps: Seq[String]): Seq[String] = {
    // pick the first separator that occurs in the text (or the last).
    var separator = seps.last
    var nextSeps: Seq[String] = Nil
    var i = 0
    var found = false
    while (i < seps.length && !found) {
      val s = seps(i)
      if (s.isEmpty) { separator = s; found = true }
      else if (text.contains(s)) {
        separator = s; nextSeps = seps.drop(i + 1); found = true
      }
      i += 1
    }

    val pieces = splitKeepSeparator(text, separator)
    val out = Seq.newBuilder[String]
    var good = Vector.empty[String]
    for (p <- pieces) {
      if (p.length < chunkSize) good :+= p
      else {
        if (good.nonEmpty) { out ++= mergePieces(good); good = Vector.empty }
        if (nextSeps.isEmpty) out += p
        else out ++= splitRec(p, nextSeps)
      }
    }
    if (good.nonEmpty) out ++= mergePieces(good)
    out.result()
  }

  /** Split on `sep`, attaching the separator to the FOLLOWING piece
    * (LangChain keep_separator=True); ""-separator = per-char. */
  private def splitKeepSeparator(text: String, sep: String): Seq[String] = {
    if (sep.isEmpty) return text.map(_.toString)
    val parts = Vector.newBuilder[String]
    var start = 0
    var idx = text.indexOf(sep)
    var first = true
    while (idx >= 0) {
      val lead = if (first) text.substring(start, idx)
                 else sep + text.substring(start, idx)
      if (lead.nonEmpty) parts += lead
      first = false
      start = idx + sep.length
      idx = text.indexOf(sep, start)
    }
    val tail = if (first) text.substring(start) else sep + text.substring(start)
    if (tail.nonEmpty) parts += tail
    parts.result()
  }

  /** Greedy merge with sliding overlap (LangChain _merge_splits with
    * keep_separator ⇒ join separator is ""). */
  private def mergePieces(pieces: Seq[String]): Seq[String] = {
    val docs = Seq.newBuilder[String]
    var current = Vector.empty[String]
    var total = 0
    def emit(): Unit = {
      val joined = current.mkString("").trim
      if (joined.nonEmpty) docs += joined
    }
    for (p <- pieces) {
      val len = p.length
      if (total + len > chunkSize && current.nonEmpty) {
        emit()
        // pop from the front until within overlap AND the new piece fits
        while (total > overlap ||
               (total + len > chunkSize && total > 0)) {
          total -= current.head.length
          current = current.tail
        }
      }
      current :+= p
      total += len
    }
    emit()
    docs.result()
  }

  /** DataFrame form: 1 row → N chunk rows.
    * Adds `chunk_index` (0-based position) and `chunk` columns. UDF is
    * justified here (§4: genuinely imperative recursive logic); the
    * explode around it stays in codegen. */
  def chunkColumn(text: Column): Column = {
    val f = udf((s: String) => split(s))
    f(text)
  }

  def apply(df: DataFrame, textCol: String): DataFrame =
    df.select(col("*"), posexplode(chunkColumn(col(textCol))).as(Seq("chunk_index", "chunk")))
}
