package graft

import graft.semantic._
import org.scalatest.funsuite.AnyFunSuite

/** L1-L4 semantic boundary: the never-fail contract + the deterministic
  * doubles (SURVEY.md §2.7). */
class SemanticFnSpec extends AnyFunSuite {

  test("a throwing SemanticFn collapses to its neutral value") {
    val boom = new SemanticFn[String, Seq[Int]] {
      val name = "boom"
      val neutral: Seq[Int] = Seq.empty
      protected def run(in: String): Seq[Int] = throw new RuntimeException("x")
    }
    assert(boom("anything") == Seq.empty)
  }

  test("a null-returning SemanticFn collapses to its neutral value") {
    val nul = new SemanticFn[String, String] {
      val name = "nul"
      val neutral = "fallback"
      protected def run(in: String): String = null
    }
    assert(nul("x") == "fallback")
  }

  test("RuleQueryNer extracts job/region/ageGroup from query tokens") {
    val ner = new RuleQueryNer(Set("join", "sort"), Set("row", "key"))
    assert(ner("looking for a join job in the row area") ==
      QueryNer(Some("join"), Some("row"), None))
    assert(ner("60대 sort in key") ==
      QueryNer(Some("sort"), Some("key"), Some("60대")))
    assert(ner("nothing matches here") == QueryNer(None, None, None))
  }

  test("withDefaults fills only missing fields; blanks count as absent (L2)") {
    val p = UserProfile(age = Some("60대"), location = Some("row"),
      jobType = Some("  ")) // blank jobType = absent (Python truthiness)
    assert(QueryNer(Some("join"), None, None).withDefaults(p) ==
      QueryNer(Some("join"), Some("row"), Some("60대")))
    // an empty-string NER value is also "missing" in the reference
    assert(QueryNer(None, Some(""), Some("50대")).withDefaults(p) ==
      QueryNer(None, Some("row"), Some("50대")))
    // all-None profile is a no-op
    assert(QueryNer(None, Some("key"), None).withDefaults(UserProfile.empty) ==
      QueryNer(None, Some("key"), None))
  }

  test("DictSynonyms returns neutral empty for unknown jobs") {
    val syn = new DictSynonyms(Map("join" -> Seq("merge", "hash")))
    assert(syn("JOIN ") == Seq("merge", "hash")) // normalized lookup
    assert(syn("unknown") == Seq.empty)
  }

  test("HeuristicJudge scores by condition-token containment, 0..5") {
    val judge = new HeuristicJudge
    val scores = judge(("join row", Seq("a join in the row zone", "join only", "nothing")))
    assert(scores == Seq(5, 3, 0))
    assert(judge(("", Seq("a"))) == Seq(0))
  }
}
