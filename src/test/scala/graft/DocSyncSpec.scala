package graft

import org.scalatest.funsuite.AnyFunSuite

/** Doc-count drift gate: README.md and COVERAGE.md state how many
  * harness queries exist and how many are oracle-checked; four rounds
  * running those numbers drifted from the registry as queries were
  * added. This spec derives the truth from [[Queries.all]] and fails
  * CI when the prose disagrees — update the docs with the new counts
  * when adding a query (the phrases below are the machine-readable
  * anchors; keep their wording).
  */
class DocSyncSpec extends AnyFunSuite {

  private val total = Queries.all.size
  private val withOracle = Queries.all.count(_.oracle.isDefined)

  private def read(name: String): String = {
    val f = new java.io.File(name)
    assert(f.exists(), s"$name not found (cwd=${new java.io.File(".").getAbsolutePath})")
    val src = scala.io.Source.fromFile(f, "UTF-8")
    try src.mkString finally src.close()
  }

  test("query registry is non-trivial and oracles dominate") {
    assert(total >= 148 && withOracle >= 144)
    assert(Queries.all.map(_.name).distinct.size == total, "duplicate query names")
  }

  test("README.md counts match the registry") {
    val readme = read("README.md")
    val named = "(\\d+) named queries".r.findFirstMatchIn(readme)
      .map(_.group(1).toInt)
    assert(named.contains(total),
      s"README 'N named queries' says $named, registry has $total")
    val oracle = "(\\d+) of (\\d+) queries are oracle-checked".r
      .findFirstMatchIn(readme).map(m => (m.group(1).toInt, m.group(2).toInt))
    assert(oracle.contains((withOracle, total)),
      s"README oracle sentence says $oracle, registry has ($withOracle, $total)")
  }

  test("COVERAGE.md counts match the registry") {
    val cov = read("COVERAGE.md")
    val m = "(\\d+) harness queries total, (\\d+) oracle-checked".r
      .findFirstMatchIn(cov).map(m => (m.group(1).toInt, m.group(2).toInt))
    assert(m.contains((total, withOracle)),
      s"COVERAGE says $m, registry has ($total, $withOracle)")
  }
}
