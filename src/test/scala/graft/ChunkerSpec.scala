package graft

import graft.operators.Chunker
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** G1 recursive chunker — boundary cases + invariants (SURVEY.md §5).
  * Chunk boundaries define every downstream id and count, so this is
  * the most heavily specified operator in the engine. */
class ChunkerSpec extends AnyFunSuite {
  import PropHelper.forAll

  private val c = Chunker(chunkSize = 20, overlap = 5)

  test("null and empty text produce no chunks") {
    assert(c.split(null) == Seq.empty)
    assert(c.split("") == Seq.empty)
    assert(c.split("   ") == Seq.empty) // trims to empty
  }

  test("text shorter than chunkSize is one chunk, trimmed") {
    assert(c.split("  hello world ") == Seq("hello world"))
  }

  test("prefers paragraph breaks over line breaks over spaces") {
    val text = "aaaa aaaa\nbbbb bbbb\n\ncccc cccc"
    val chunks = c.split(text)
    // the \n\n boundary must never be crossed mid-chunk when splitting
    assert(chunks.exists(_.startsWith("cccc")))
  }

  test("exact-multiple length splits cleanly") {
    val text = ("x" * 10) + " " + ("y" * 9) // 20 chars with the space
    assert(c.split(text) == Seq(("x" * 10) + " " + ("y" * 9)))
  }

  test("text with no separators falls back to per-char split") {
    val text = "z" * 45
    val chunks = c.split(text)
    assert(chunks.nonEmpty)
    assert(chunks.forall(_.length <= 20))
    // overlap: adjacent chunks share a suffix/prefix
    chunks.sliding(2).foreach {
      case Seq(a, b) => assert(b.startsWith(a.takeRight(5)))
      case _         =>
    }
  }

  test("reference configuration (300/50) on a realistic blob") {
    val ref = Chunker() // 300/50, default separators
    val para = "The quick brown fox jumps over the lazy dog. " * 12
    val text = s"$para\n\n$para\n\n$para"
    val chunks = ref.split(text)
    assert(chunks.forall(_.length <= 300))
    assert(chunks.forall(_.trim.nonEmpty))
  }

  private val textGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 400)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar, 3 -> Gen.const(' '),
      1 -> Gen.const('\n'), 1 -> Gen.const('한')))
  } yield {
    val s = cs.mkString
    // sprinkle paragraph breaks
    s.replace("qq", "\n\n")
  }

  test("property: every chunk fits, is non-blank, and is a substring") {
    forAll(textGen) { text =>
      val chunks = c.split(text)
      assert(chunks.forall(_.length <= c.chunkSize))
      assert(chunks.forall(_.trim.nonEmpty))
      assert(chunks.forall(ch => text.contains(ch)))
    }
  }

  test("property: non-whitespace content is covered by some chunk") {
    forAll(textGen) { text =>
      val chunks = c.split(text)
      if (text.trim.nonEmpty) {
        assert(chunks.nonEmpty)
        // every non-ws char of the text appears in at least one chunk
        val joined = chunks.mkString(" ")
        val lost = text.filterNot(_.isWhitespace).groupBy(identity).keySet --
          joined.filterNot(_.isWhitespace).groupBy(identity).keySet
        assert(lost.isEmpty, s"lost chars $lost from '$text'")
      }
    }
  }

  test("determinism: same input, same chunks") {
    forAll(textGen) { text =>
      assert(c.split(text) == c.split(text))
    }
  }
}
