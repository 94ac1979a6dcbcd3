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

  test("calibration probe field rides the summary line when provided") {
    val line = Bench.summaryLine(
      Map("qa" -> 1.0), scala.collection.mutable.LinkedHashMap.empty[String, String],
      reps = 1, sfDir = "/sf", calib = 0.0789)
    assert(line.contains(""""calib":0.079"""), line)
    val node = strictParse(line).getOrElse(fail(s"not strict JSON: $line"))
    assert(node.get("calib").isNumber)
    // omitted (not a bogus value) when the caller has no probe sample
    val bare = Bench.summaryLine(Map("qa" -> 1.0),
      scala.collection.mutable.LinkedHashMap.empty[String, String], 1, "/sf")
    assert(!bare.contains("calib"))
  }

  test("calib-normalized total rides the line: total / calib, mechanical") {
    val line = Bench.summaryLine(
      Map("qa" -> 2.0, "qb" -> 3.0),
      scala.collection.mutable.LinkedHashMap.empty[String, String],
      reps = 1, sfDir = "/sf", calib = 0.25)
    val node = strictParse(line).getOrElse(fail(s"not strict JSON: $line"))
    // 5.0 s of queries / 0.25 s probe = 20.0 probe-units
    assert(math.abs(node.get("total_calib_norm").asDouble - 20.0) < 1e-9, line)
    // no probe sample -> no normalized field either
    val bare = Bench.summaryLine(Map("qa" -> 1.0),
      scala.collection.mutable.LinkedHashMap.empty[String, String], 1, "/sf")
    assert(!bare.contains("total_calib_norm"))
  }

  test("failed queries (-1 sentinel) are excluded from the total AND nq") {
    val line = Bench.summaryLine(
      Map("qa" -> 2.0, "qb" -> -1.0),
      scala.collection.mutable.LinkedHashMap("qb" -> "ArithmeticException: x"),
      reps = 1, sfDir = "/sf")
    assert(line.contains(""""value":2.000"""))
    // nq must match the total's coverage (successes only); the failure is
    // surfaced separately so the gap is explicit, not hidden.
    assert(line.contains(""""nq":1"""))
    assert(line.contains(""""nfail":1"""))
    assert(line.contains(""""errors":{"qb":"ArithmeticException: x"}"""))
  }

  // --- driver-tail contract -------------------------------------------
  // The round driver keeps the last 2000 chars of the run's output and
  // tries json-parsing it line by line. These tests replicate that with a
  // strict JSON parser (Jackson, from the Spark classpath) against the
  // exact emission path Bench.main uses.

  private def strictParse(s: String): Option[com.fasterxml.jackson.databind.JsonNode] =
    try Some(new com.fasterxml.jackson.databind.ObjectMapper().readTree(s))
    catch { case _: Exception => None }

  test("summary line is strict JSON with the gate fields") {
    val line = Bench.summaryLine(
      Bench.headline.map(_ -> 0.5).toMap ++ Map("qx" -> -1.0),
      scala.collection.mutable.LinkedHashMap("qx" -> "boom \"quoted\"\npath"),
      reps = 3, sfDir = "/root/testdata/sf0.1")
    val node = strictParse(line).getOrElse(fail(s"not strict JSON: $line"))
    assert(node.get("metric").asText == "total")
    assert(node.get("value").isNumber)
    assert(node.get("nq").asInt == Bench.headline.size)
    assert(node.get("queries").get("q01_scan").isNumber)
  }

  test("every headline entry is a declared query (renames can't silently drop itemization)") {
    val declared = SparkEntry.queries.keySet
    val missing = Bench.headline.filterNot(declared)
    assert(missing.isEmpty, s"headline names not in SparkEntry.queries: $missing")
  }

  test("emit writes the line exactly once, flushed, nothing else") {
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bos, true, "UTF-8")) {
      Bench.emit("""{"metric":"total"}""")
    }
    assert(bos.toString("UTF-8") == "{\"metric\":\"total\"}\n")
  }

  test("raw summary line survives a 2000-char tail and parses; [info]-wrapped does not") {
    val line = Bench.summaryLine(
      Bench.headline.map(_ -> 1.234).toMap, // full headline = worst-case length
      scala.collection.mutable.LinkedHashMap.empty[String, String],
      reps = 3, sfDir = "/root/testdata/sf0.1")
    // Emission order as of round 5: Spark log noise, then the raw line,
    // then NOTHING (StdoutOutput passes it through, showSuccess=false
    // drops sbt's trailer). The parseable line must be in the tail.
    val noise = (1 to 40).map(i => s"26/08/13 01:32:41 WARN Something: line $i").mkString("\n")
    val tail = (noise + "\n" + line + "\n").takeRight(2000)
    val hits = tail.linesIterator.flatMap(strictParse).filter(n => n.has("metric")).toSeq
    assert(hits.size == 1 && hits.head.get("metric").asText == "total")
    // The round-1..4 failure mode, pinned as a negative: an sbt-logger
    // wrapped line is NOT raw JSON and must never be the emission path.
    assert(strictParse(s"[info] $line").isEmpty)
  }

  test("reps=1 warms with a wider budget fraction; unwarmed queries are stamped cold") {
    // A single timed pass has no median to absorb a cold first sample, so
    // the warmup allowance must widen (the r8/r9/r10 phantom-regression
    // pattern: reps=1 capture + skipped warmup = 2-3x ghost readings)...
    assert(Bench.warmupFraction(1) > Bench.warmupFraction(3))
    assert(Bench.warmupFraction(1) >= 0.7 && Bench.warmupFraction(3) <= 0.4)
    // ...and any query that STILL ran its only timed sample cold must be
    // marked so judges stop re-adjudicating phantom regressions.
    val line = Bench.summaryLine(Map("qa" -> 1.0),
      scala.collection.mutable.LinkedHashMap.empty[String, String],
      reps = 1, sfDir = "/sf", calib = 0.1, nCold = 3)
    val node = strictParse(line).getOrElse(fail(s"not strict JSON: $line"))
    assert(node.get("ncold").asInt == 3)
    // fully-warmed runs carry no cold field at all
    val warm = Bench.summaryLine(Map("qa" -> 1.0),
      scala.collection.mutable.LinkedHashMap.empty[String, String],
      reps = 1, sfDir = "/sf")
    assert(!warm.contains("ncold"))
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
