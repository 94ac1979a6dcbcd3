package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Misra–Gries mergeable-summary guarantee: after any partitioning and
  * merge order, the surviving keys are a superset of every item with
  * true frequency > n/k — the property q171's exact verification pass
  * relies on.
  */
class MisraGriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sketchKeys(items: Seq[String], k: Int, parts: Int): Set[String] = {
    val mg = udaf(new MisraGries(k))
    items.toDF("token").repartition(parts)
      .agg(mg(col("token")).as("sk"))
      .select(explode(map_keys(col("sk"))).as("t"))
      .as[String].collect().toSet
  }

  test("heavy items survive the distributed sketch (superset guarantee)") {
    val rnd = new scala.util.Random(42)
    // 3 heavy keys at ~15% each over a long tail of near-singletons
    val heavy = Seq.fill(1500)("h1") ++ Seq.fill(1400)("h2") ++ Seq.fill(1300)("h3")
    val tail = (0 until 5800).map(i => s"t${i % 2900}")
    val items = rnd.shuffle(heavy ++ tail) // n = 10000
    for (parts <- Seq(1, 4, 13)) {
      val keys = sketchKeys(items, k = 10, parts = parts) // threshold n/k = 1000
      assert(Set("h1", "h2", "h3").subsetOf(keys),
        s"parts=$parts: heavy keys missing from $keys")
      assert(keys.size < 10, s"parts=$parts: summary must stay bounded")
    }
  }

  test("adversarial order: heavy key arriving last still survives") {
    val items = (0 until 900).map(i => s"x$i") ++ Seq.fill(150)("late")
    val keys = sketchKeys(items, k = 7, parts = 3) // n=1050, n/k=150: late=150 is NOT > n/k
    // late has count exactly n/7; the guarantee is only for count > n/k,
    // but with every other key a singleton the summary retains it anyway
    assert(keys.contains("late"))
  }

  test("merge of disjoint partials keeps both sides' weight") {
    val items = Seq.fill(600)("a") ++ (0 until 400).map(i => s"u$i")
    val keys = sketchKeys(items, k = 5, parts = 8) // a: 60% >> n/5
    assert(keys.contains("a"))
  }
}
