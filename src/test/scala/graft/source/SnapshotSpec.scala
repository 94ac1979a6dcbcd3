package graft.source

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins the JDBC snapshot reader's pushed subquery, partitioned-read plan
  * options, and reference-skip semantics (reference `src/main.rs:49-75`).
  */
class SnapshotSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark

  test("snapshotQuery pushes a key-only projection with validity predicates") {
    val q = Snapshot.snapshotQuery("patient")
    assert(q ===
      "(SELECT id AS pk_id, resource->>'id' AS resource_id, " +
        "resource#>>'{meta,versionId}' AS version_text FROM patient " +
        "WHERE resource->>'id' IS NOT NULL " +
        "AND resource#>>'{meta,versionId}' IS NOT NULL) AS patient_versions")
    // the JSONB payload itself must never be selected
    assert(!q.contains("resource::text") && !q.contains("SELECT *"))
  }

  test("readerOptions plans a ranged partitioned read on the SERIAL pk") {
    val o = Snapshot.readerOptions("jdbc:postgresql://h:5432/d", "patient",
      "u", "p", numPartitions = 8, lowerBound = 1L, upperBound = 20893L)
    assert(o("dbtable") === Snapshot.snapshotQuery("patient"))
    assert(o("partitionColumn") === "pk_id")
    assert(o("lowerBound") === "1" && o("upperBound") === "20893")
    assert(o("numPartitions") === "8")
    assert(o("fetchsize") === "5000")
  }

  test("readerOptions degenerate bounds (empty table) still form a valid range") {
    val o = Snapshot.readerOptions("u", "t", "u", "p", 4, 0L, 0L)
    assert(o("lowerBound").toLong < o("upperBound").toLong)
  }

  test("boundsQuery reads min/max of the pk only") {
    assert(Snapshot.boundsQuery("patient") ===
      "SELECT min(id) AS lo, max(id) AS hi FROM patient")
  }

  test("fromRaw drops unparseable versions and casts pk, like the reference's skip") {
    val spark2 = spark
    import spark2.implicits._
    val raw = Seq(
      (1L, "a", "7"),          // valid
      (2L, "b", "not-a-long"), // version parse failure → skipped (main.rs:66-72)
      (3L, null, "9"),         // no id → skipped
      (4L, "d", null)          // no version → skipped
    ).toDF("pk_id", "resource_id", "version_text")
    val out = Snapshot.fromRaw(raw).collect()
    assert(out.length === 1)
    assert(out(0).getInt(0) === 1 && out(0).getString(1) === "a" && out(0).getLong(2) === 7L)
  }
}
