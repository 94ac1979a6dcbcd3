package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Pins the doc-visible query counts to the authoritative registry
  * (`SparkEntry.queries`) — three rounds of ADVICE flagged stale
  * "NNN-query inventory" strings, so the count is now derived, not
  * hand-maintained: README's inventory pointer and SURVEY §8's header
  * must state the actual registry size, and queries/oracleSql must stay
  * key-identical (every declared query has its DuckDB twin).
  */
class DocConsistencySpec extends AnyFunSuite {

  private def read(p: String): String =
    new String(Files.readAllBytes(Paths.get(p)), "UTF-8")

  test("queries and oracleSql are key-identical") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("README states the registry's actual query count") {
    val n = SparkEntry.queries.size
    assert(read("README.md").contains(s"$n-query inventory"),
      s"README.md must say '$n-query inventory' (registry holds $n)")
  }

  test("SURVEY §8 header states the registry's actual query count") {
    val n = SparkEntry.queries.size
    assert(read("SURVEY.md").contains(s"**$n declared queries**"),
      s"SURVEY.md §8 must say '**$n declared queries**' (registry holds $n)")
  }
}
