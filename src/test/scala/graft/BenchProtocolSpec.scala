package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Bench one-line JSON protocol: the round harness stores only
  * the last 2000 characters of output, so the summary line must fit that
  * tail with room for the build tool's trailing status line — no matter
  * how many queries are declared or how many fail.
  */
class BenchProtocolSpec extends AnyFunSuite {

  private def fakeResults(n: Int): Map[String, Double] =
    (1 to n).map(i => f"q${i}%03d_some_quite_long_query_name" -> i * 0.123).toMap

  test("summary line stays under 1800 chars for 500 queries + 20 errors") {
    val errors = scala.collection.mutable.LinkedHashMap(
      (1 to 20).map(i => s"q$i" -> ("boom " * 40)): _*)
    val line = Bench.summaryLine(
      fakeResults(500) ++ Bench.headline.map(_ -> 1.0).toMap,
      errors, reps = 3, sfDir = "/root/testdata/sf0.1")
    assert(!line.contains("\n"))
    assert(line.length < 1800, s"line is ${line.length} chars")
  }

  test("summary line carries the gate fields and totals ALL queries") {
    val line = Bench.summaryLine(
      Map("qa" -> 1.5, "qb" -> 2.5, "q01_scan" -> 1.0),
      scala.collection.mutable.LinkedHashMap.empty[String, String],
      reps = 2, sfDir = "/sf")
    assert(line.startsWith("""{"metric":"total","value":5.000,"unit":"sec""""))
    assert(line.contains(""""reps":2"""))
    assert(line.contains(""""nq":3"""))
    // headline member is itemized; non-headline queries are not
    assert(line.contains(""""q01_scan":1.000"""))
    assert(!line.contains("\"qa\""))
  }

  test("failed queries (-1 sentinel) are excluded from the total") {
    val line = Bench.summaryLine(
      Map("qa" -> 2.0, "qb" -> -1.0),
      scala.collection.mutable.LinkedHashMap("qb" -> "ArithmeticException: x"),
      reps = 1, sfDir = "/sf")
    assert(line.contains(""""value":2.000"""))
    assert(line.contains(""""errors":{"qb":"ArithmeticException: x"}"""))
  }

  test("error messages are escaped and truncated; overflow is counted") {
    val errors = scala.collection.mutable.LinkedHashMap(
      (1 to 6).map(i => s"q$i" -> ("a\"b\n" + "x" * 100)): _*)
    val line = Bench.summaryLine(Map("qa" -> 1.0), errors, 1, "/sf")
    assert(line.contains("\\\"") && line.contains("\\n") && line.contains("\\u0001"))
    assert(line.contains(""""_more_errors":2"""))
    assert(!line.exists(c => c < ' '))
  }
}
