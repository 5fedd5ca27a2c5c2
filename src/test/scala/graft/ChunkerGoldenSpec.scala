package graft

import graft.operators.Chunker

/** G1 golden parity: the Scala Chunker must be byte-identical to the
  * committed cross-language golden file (tools/golden_chunks.py — an
  * independent Python implementation of the same published
  * RecursiveCharacterTextSplitter semantics, incl. multi-KB Korean,
  * char-level fallback, and boundary/degenerate cases at two
  * (chunkSize, overlap) configurations). Any silent drift in chunk
  * boundaries — which define every downstream chunk id — fails here. */
class ChunkerGoldenSpec extends SparkSpec {

  test("chunker output is byte-identical to the cross-language golden file") {
    val path = getClass.getResource("/chunker_golden.json").getPath
    val cases = spark.read
      .option("multiLine", true)
      .schema("name STRING, chunk_size INT, overlap INT, text STRING, " +
        "chunks ARRAY<STRING>")
      .json(path)
      .collect()
    assert(cases.length == 24, "golden file must load all cases")
    var checked = 0
    cases.foreach { r =>
      val name = r.getString(0)
      val chunker = Chunker(chunkSize = r.getInt(1), overlap = r.getInt(2))
      val text = if (r.isNullAt(3)) "" else r.getString(3)
      val expected = r.getSeq[String](4)
      val got = chunker.split(text)
      assert(got == expected,
        s"case $name: got ${got.length} chunks, expected ${expected.length};" +
          s" first diff at ${got.zip(expected).indexWhere(p => p._1 != p._2)}")
      checked += 1
    }
    assert(checked == 24)
  }
}
