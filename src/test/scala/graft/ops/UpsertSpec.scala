package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  // (key, version, value, op)
  private def df(rows: (Long, Long, String, String)*) =
    rows.toDF("k", "v", "payload", "op")

  private def merged(base: Seq[(Long, Long, String, String)],
                     changes: Seq[(Long, Long, String, String)]) =
    Upsert.merge(df(base: _*), df(changes: _*), Seq("k"),
        Seq(col("v").desc), col("op") === "delete")
      .select("k", "v", "payload").as[(Long, Long, String)]
      .collect().sortBy(_._1).toSeq

  test("newer change overwrites; absent key inserts") {
    assert(merged(
      base = Seq((1L, 1L, "old", "upsert"), (2L, 1L, "keep", "upsert")),
      changes = Seq((1L, 2L, "new", "upsert"), (3L, 1L, "ins", "upsert"))) ==
      Seq((1L, 2L, "new"), (2L, 1L, "keep"), (3L, 1L, "ins")))
  }

  test("a change OLDER than the snapshot row does not regress it") {
    assert(merged(
      base = Seq((1L, 5L, "current", "upsert")),
      changes = Seq((1L, 3L, "stale", "upsert"))) ==
      Seq((1L, 5L, "current")))
  }

  test("tombstone removes the key; a late update below it stays dead") {
    assert(merged(
      base = Seq((1L, 1L, "x", "upsert")),
      changes = Seq((1L, 9L, "", "delete"), (1L, 4L, "late", "upsert"))) ==
      Seq.empty)
  }

  test("an update NEWER than a tombstone resurrects the key") {
    assert(merged(
      base = Seq.empty,
      changes = Seq((1L, 2L, "", "delete"), (1L, 5L, "back", "upsert"))) ==
      Seq((1L, 5L, "back")))
  }

  test("reserved __rn column is rejected") {
    val bad = Seq((1L, 1L)).toDF("k", "__rn")
    intercept[IllegalArgumentException] {
      Upsert.keepLatest(bad, Seq("k"), Seq(col("__rn").desc))
    }
  }

  test("q67 fixture invariants: one row per surviving user, no error winners") {
    val rows = graft.queries.Warehouse.q67Upsert(spark, "/root/testdata/sf0.001")
      .select("user_id", "last_type")
      .as[(Long, String)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length == rows.length, "duplicate user rows")
    assert(rows.forall(_._2 != "error"), "tombstone leaked into the result")
  }
}
