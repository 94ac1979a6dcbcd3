package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkTestSession

/** GlobalRank must be EXACTLY `row_number() OVER (ORDER BY …)` — the
  * q121/q110 oracles hash-compare its output against DuckDB's global
  * window, so off-by-one at any range boundary, a dropped empty
  * partition, or a miscomposed offset is a correctness bug, not a
  * perf detail.
  */
class GlobalRankSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark

  test("property: rowNumber equals a driver-side global sort rank") {
    val spark2 = spark
    import spark2.implicits._
    val row = Gen.zip(Gen.choose(0L, 40L), Gen.choose(0.0, 1.0))
    (0 until 3).foreach { i =>
      val rows = Gen.listOfN(200, row)(Gen.Parameters.default, Seed(11L + i)).get
        .zipWithIndex.map { case ((k, v), id) => (k, v, id.toLong) }
      // ties on k are broken by the unique id — a TOTAL order, as the
      // helper's contract requires
      val expected = rows.sortBy(r => (r._1, r._3)).zipWithIndex
        .map { case (r, rk) => r._3 -> (rk + 1L) }.toMap
      // numParts spanning: single partition, fewer than keys, more than rows
      Seq(1, 5, 300).foreach { p =>
        val got = GlobalRank.rowNumber(rows.toDF("k", "v", "id"), "rk",
            Seq(col("k"), col("id")), numParts = p)
          .select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        graft.util.QueryCaches.drain()
        assert(got === expected, s"seed ${11L + i}, numParts $p")
      }
    }
  }

  test("descending sort columns rank identically to the window form") {
    val spark2 = spark
    import spark2.implicits._
    val rows = (0 until 100).map(i => ((i * 7) % 13, i.toLong))
    val expected = rows.sortBy { case (df, id) => (-df, id) }.zipWithIndex
      .map { case (r, rk) => r._2 -> (rk + 1L) }.toMap
    val got = GlobalRank.rowNumber(rows.toDF("df", "id"), "rk",
        Seq(col("df").desc, col("id")), numParts = 7)
      .select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.util.QueryCaches.drain()
    assert(got === expected)
  }

  test("empty input yields an empty ranked relation") {
    val spark2 = spark
    import spark2.implicits._
    val got = GlobalRank.rowNumber(
      Seq.empty[(Long, Long)].toDF("k", "id"), "rk", Seq(col("k"), col("id")))
    assert(got.count() === 0L)
    graft.util.QueryCaches.drain()
  }

  test("property: prefixSum equals a driver-side exclusive running sum") {
    val spark2 = spark
    import spark2.implicits._
    val row = Gen.zip(Gen.choose(0L, 40L), Gen.choose(0L, 1000L))
    (0 until 3).foreach { i =>
      val rows = Gen.listOfN(200, row)(Gen.Parameters.default, Seed(97L + i)).get
        .zipWithIndex.map { case ((k, w), id) => (k, w, id.toLong) }
      val sorted = rows.sortBy(r => (r._1, r._3))
      val expected = sorted.zip(sorted.scanLeft(0L)(_ + _._2))
        .map { case (r, before) => r._3 -> before }.toMap
      Seq(1, 5, 300).foreach { p =>
        val got = GlobalRank.prefixSum(rows.toDF("k", "w", "id"), "before",
            col("w"), Seq(col("k"), col("id")), numParts = p)
          .select("id", "before").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        graft.util.QueryCaches.drain()
        assert(got === expected, s"seed ${97L + i}, numParts $p")
      }
    }
  }

  test("prefixSum counts a null weight as 0") {
    val spark2 = spark
    import spark2.implicits._
    val rows: Seq[(Long, Option[Long], Long)] =
      Seq((0L, Some(5L), 0L), (0L, None, 1L), (1L, Some(3L), 2L), (1L, None, 3L), (2L, Some(7L), 4L))
    val expected = Map(0L -> 0L, 1L -> 5L, 2L -> 5L, 3L -> 8L, 4L -> 8L)
    Seq(1, 3).foreach { p =>
      val got = GlobalRank.prefixSum(rows.toDF("k", "w", "id"), "before",
          col("w"), Seq(col("k"), col("id")), numParts = p)
        .select("id", "before").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      graft.util.QueryCaches.drain()
      assert(got === expected, s"numParts $p")
    }
  }

  test("property: prefixMax equals a driver-side exclusive running max") {
    val spark2 = spark
    import spark2.implicits._
    val row = Gen.zip(Gen.choose(0L, 40L), Gen.choose(-1000L, 1000L))
    (0 until 3).foreach { i =>
      val rows = Gen.listOfN(200, row)(Gen.Parameters.default, Seed(53L + i)).get
        .zipWithIndex.map { case ((k, v), id) => (k, v, id.toLong) }
      val sorted = rows.sortBy(r => (r._1, r._3))
      val expected = sorted.zip(
          sorted.scanLeft(Option.empty[Long])((m, r) =>
            Some(m.fold(r._2)(math.max(_, r._2)))))
        .map { case (r, before) => r._3 -> before }.toMap
      Seq(1, 5, 300).foreach { p =>
        val got = GlobalRank.prefixMax(rows.toDF("k", "v", "id"), "before",
            col("v"), Seq(col("k"), col("id")), numParts = p)
          .select("id", "before").collect()
          .map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) Option.empty[Long] else Some(r.getLong(1))))
          .toMap
        graft.util.QueryCaches.drain()
        assert(got === expected, s"seed ${53L + i}, numParts $p")
      }
    }
  }

  test("prefixMax ignores null values like the window form") {
    val spark2 = spark
    import spark2.implicits._
    val rows: Seq[(Long, Option[Long], Long)] =
      Seq((0L, None, 0L), (0L, Some(5L), 1L), (1L, None, 2L),
        (1L, Some(3L), 3L), (2L, Some(7L), 4L))
    val expected = Map(0L -> None, 1L -> None, 2L -> Some(5L),
      3L -> Some(5L), 4L -> Some(5L))
    Seq(1, 3).foreach { p =>
      val got = GlobalRank.prefixMax(rows.toDF("k", "v", "id"), "before",
          col("v"), Seq(col("k"), col("id")), numParts = p)
        .select("id", "before").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) Option.empty[Long] else Some(r.getLong(1))))
        .toMap
      graft.util.QueryCaches.drain()
      assert(got === expected, s"numParts $p")
    }
  }

  test("prefixMax rejects fractional value columns at plan time") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, 1.5, 1L), (1L, 2.5, 2L)).toDF("k", "v", "id")
    val e = intercept[IllegalArgumentException] {
      GlobalRank.prefixMax(df, "before", col("v"), Seq(col("k"), col("id")))
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
    graft.util.QueryCaches.drain()
  }

  test("prefixSum on empty input yields an empty relation") {
    val spark2 = spark
    import spark2.implicits._
    val got = GlobalRank.prefixSum(
      Seq.empty[(Long, Long, Long)].toDF("k", "w", "id"), "before",
      col("w"), Seq(col("k"), col("id")))
    assert(got.count() === 0L)
    graft.util.QueryCaches.drain()
  }
}
