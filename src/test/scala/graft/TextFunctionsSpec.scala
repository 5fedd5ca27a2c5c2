package graft

import graft.functions.{TextAnalysis, TextFunctions}
import org.apache.spark.sql.functions._

/** P1-P12 scalar transforms + text-analysis functions (SURVEY.md §2.2,
  * north-star text analysis). */
class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): String =
    Seq(1).toDF("x").select(c.cast("string")).as[String].head()

  test("P1 cleanText strips tags, folds newlines, trims") {
    assert(one(TextFunctions.cleanText(
      lit(" <b>hello</b>\n<i>world</i> "))) == "hello world")
  }

  test("P6 stripFences removes markdown code fences") {
    assert(one(TextFunctions.stripFences(
      lit("```json\n{\"a\":1}\n```"))) == "{\"a\":1}")
  }

  test("P11 normalize lowercases and trims") {
    assert(one(TextFunctions.normalize(lit("  MiXeD Case "))) == "mixed case")
  }

  test("P2 flattenRequirements renders 'key: v1 v2' lines") {
    val df = Seq(1).toDF("x").select(
      array(map(lit("경력조건"), array(lit("무관")),
        lit("학력"), array(lit("고졸"), lit("이상")))).as("reqs"))
    val out = df.select(TextFunctions.flattenRequirements($"reqs")).as[String].head()
    assert(out == "경력조건: 무관\n학력: 고졸 이상")
  }

  test("P5 chunkIdPortable sanitizes to [a-zA-Z0-9_-]") {
    val id = one(TextFunctions.chunkIdPortable(lit(7), lit(2), lit("무궁화 꽃이")))
    assert(id.matches("[a-zA-Z0-9_-]+"))
    assert(id.startsWith("7_chunk2_"))
  }

  test("P4 nerMerge appends the NER block") {
    val out = one(TextFunctions.nerMerge(lit("body"), lit("{\"a\":1}")))
    assert(out == "body\n\n[NER 추출 정보]\n{\"a\":1}")
  }

  test("token counts: whitespace and BPE-ish") {
    val df = Seq(("one two  three\nfour", "ab12!cd")).toDF("a", "b")
    val (ws, bpe) = df.select(
      TextAnalysis.tokenCountWs($"a"),
      TextAnalysis.tokenCountBpeish($"b")).as[(Int, Int)].head()
    assert(ws == 4)
    assert(bpe == 4) // "ab" "12" "!" "cd"
    assert(Seq("").toDF("a")
      .select(TextAnalysis.tokenCountWs($"a")).as[Int].head() == 0)
  }

  test("shingles: fewer than k words yields empty array; distinct") {
    val df = Seq("a b", "a b a b").toDF("t")
    val out = df.select(TextAnalysis.shingles($"t", 3)).as[Seq[String]].collect()
    assert(out(0).isEmpty)
    assert(out(1) == Seq("a b a", "b a b")) // distinct 3-shingles
  }

  test("shinglesFast (UDF hot path) equals the expression form") {
    import org.scalacheck.Gen
    val texts = Gen.listOfN(12, Gen.oneOf("a", "b", "cc", " ", "\n", "dd e"))
      .map(_.mkString(" "))
    PropHelper.forAll(texts, 50) { t =>
      for (k <- Seq(1, 2, 3)) {
        val (fast, expr) = Seq(t).toDF("t").select(
          TextAnalysis.shinglesFast($"t", k), TextAnalysis.shingles($"t", k))
          .as[(Seq[String], Seq[String])].head()
        assert(fast == expr, s"k=$k text='$t'")
      }
    }
  }

  test("jaccard: disjoint 0, identical 1, empty-empty 0") {
    val df = Seq(1).toDF("x")
    def j(a: Seq[String], b: Seq[String]): Double =
      df.select(TextAnalysis.jaccard(
        typedlit(a), typedlit(b))).as[Double].head()
    assert(j(Seq("a"), Seq("b")) == 0.0)
    assert(j(Seq("a", "b"), Seq("a", "b")) == 1.0)
    assert(j(Seq.empty, Seq.empty) == 0.0)
  }

  test("fingerprint is stable under token reorder and duplication") {
    val df = Seq(("b a c", "c c a b b")).toDF("x", "y")
    val (f1, f2) = df.select(
      TextAnalysis.fingerprint($"x"), TextAnalysis.fingerprint($"y"))
      .as[(String, String)].head()
    assert(f1 == f2)
  }

  test("winnowing grams: hashes are positional and engine-portable range") {
    val df = Seq((1L, "abcdefghij"), (2L, "short")).toDF("doc_id", "text")
    val out = TextAnalysis.charGramHashes(df, "doc_id", "text", 8)
      .orderBy("doc_id", "pos")
      .select("doc_id", "n_grams", "pos", "gram_hash")
      .as[(Long, Int, Int, Long)].collect().toSeq
    // doc 1: 10 chars → 3 grams at pos 1..3; doc 2 (<k chars) → none
    assert(out.map(r => (r._1, r._3)) == Seq((1L, 1), (1L, 2), (1L, 3)))
    // n_grams carries len−k+1 (= max pos) from generation time
    assert(out.forall(r => r._2 == 3))
    assert(out.forall(r => r._4 >= 0 && r._4 < (1L << 60)))
    // identical grams hash identically across rows
    val dup = TextAnalysis.charGramHashes(
      Seq((1L, "xxxxxxxxy"), (2L, "xxxxxxxxz")).toDF("doc_id", "text"),
      "doc_id", "text", 8)
      .filter($"pos" === 1).select("gram_hash").as[Long].collect()
    assert(dup(0) == dup(1)) // both pos-1 grams are "xxxxxxxx"
  }

  test("langId picks the dominant marker language, 'und' when none") {
    val df = Seq("the cat is on the mat and it is warm",
      "der hund und die katze ist hier", "xyz qq 123").toDF("t")
    val out = df.select(TextAnalysis.langId($"t")).as[String].collect().toSeq
    assert(out == Seq("en", "de", "und"))
  }

  test("qualityScore is in [0,1] and rewards clean prose") {
    val df = Seq("The quick brown fox jumps over the lazy dog and it is fine",
      "@@@###!!!").toDF("t")
    val out = df.select(TextAnalysis.qualityScore($"t")).as[Double].collect()
    assert(out.forall(s => s >= 0.0 && s <= 1.0))
    assert(out(0) > out(1))
  }

  test("lineLangProfile: majority vote, tie-break, mixed flag, whitespace dropout") {
    val docs = Seq(
      // 2 en lines, 1 de, 1 fr → major en, mixed
      (1L, "the and of\nder und ist\nle et est\nthe is to"),
      // no markers at all → single 'und' line, not mixed
      (2L, "hola mundo"),
      // 1 en line vs 1 de line → count tie → lang asc picks 'de'
      (3L, "the and\nder und"),
      // whitespace-only: no non-empty line → absent from the output
      (4L, "   \n \n")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lineLangProfile(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, String, String, Long, Long, Boolean)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 3L))
    val r1 = out(0)
    assert(r1._3 == "en" && r1._4 == 2L && r1._5 == 4L && r1._6)
    val r2 = out(1)
    assert(r2._3 == "und" && r2._5 == 1L && !r2._6)
    val r3 = out(2)
    assert(r3._3 == "de" && r3._4 == 1L && r3._5 == 2L && r3._6)
  }

  test("property: narrow winnowFingerprints == the exploded windowed formulation") {
    import org.scalacheck.Gen
    import org.apache.spark.sql.expressions.Window
    // random texts spanning every length regime (below k, exactly one
    // full window, many windows) plus a low-alphabet generator so
    // repeated grams produce hash ties inside windows
    val gen = for {
      k <- Gen.oneOf(3, 5)
      w <- Gen.oneOf(2, 4)
      texts <- Gen.listOfN(12, for {
        n <- Gen.choose(0, 40)
        cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
      } yield cs.mkString)
    } yield (k, w, texts)
    PropHelper.forAll(gen, n = 6) { case (k, w, texts) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val narrow = TextAnalysis.winnowFingerprints(df, "doc_id", "text", k, w)
        .select(col("doc_id"), size(col("fps")).cast("long").as("n"),
          array_min(col("fps")).as("mn"), array_max(col("fps")).as("mx"))
        .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
      val roll = Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(0, w - 1)
      val windowed = TextAnalysis.charGramHashes(df, "doc_id", "text", k)
        .withColumn("fp", min("gram_hash").over(roll))
        .filter(col("pos") <= col("n_grams") - (w - 1))
        .select("doc_id", "fp").distinct()
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n"), min("fp").as("mn"), max("fp").as("mx"))
        .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
      assert(narrow == windowed, s"k=$k w=$w texts=$texts")
    }
  }
}
