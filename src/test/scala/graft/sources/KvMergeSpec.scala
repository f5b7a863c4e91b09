package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** The graft-kv delta connector: SQL MERGE/UPDATE/DELETE write ONLY the
  * touched rows as operation records (merge-on-read), the commit marker
  * makes torn writes invisible, and the scan folds base + deltas
  * last-wins per key.
  */
class KvMergeSpec extends SparkSpec {
  import spark.implicits._

  private val Cat = "kv_mrg"
  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("kv_cat_").toString
    spark.conf.set(s"spark.sql.catalog.$Cat",
      classOf[graft.sources.v2.KvCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$Cat.root", r)
    spark.conf.set(s"spark.sql.catalog.$Cat.buckets", "4")
    r
  }

  private def seed(table: String, rows: Seq[(Long, String, Double)]): Unit = {
    val r = root // force the lazy catalog registration before any SQL
    spark.sql(s"CREATE TABLE IF NOT EXISTS $Cat.$table " +
      "(id BIGINT, name STRING, value DOUBLE)")
    rows.toDF("id", "name", "value").write.format("graft-kv")
      .option("path", s"$root/$table").option("buckets", 4)
      .mode("overwrite").save()
  }

  private def state(table: String): Map[Long, (String, Double)] =
    spark.table(s"$Cat.$table").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap

  test("MERGE writes only the touched rows as a delta commit") {
    seed("m1", Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0),
      (5L, "e", 50.0), (6L, "f", 60.0), (7L, "g", 70.0)))
    Seq((2L, "B", 200.0), (4L, "D", -1.0), (8L, "H", 800.0))
      .toDF("id", "name", "value").createOrReplaceTempView("kv_src")
    spark.sql(
      s"""MERGE INTO $Cat.m1 t USING kv_src s ON t.id = s.id
         |WHEN MATCHED AND s.value < 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET name = s.name, value = s.value
         |WHEN NOT MATCHED THEN INSERT (id, name, value) VALUES (s.id, s.name, s.value)
         |""".stripMargin)
    assert(state("m1") == Map(
      1L -> ("a", 10.0), 2L -> ("B", 200.0), 3L -> ("c", 30.0),
      5L -> ("e", 50.0), 6L -> ("f", 60.0), 7L -> ("g", 70.0),
      8L -> ("H", 800.0)))
    // THE delta-vs-group distinction: the merge commit logged exactly
    // the 3 touched rows (U, D, I), not the 7-row table
    val commits = graft.sources.v2.KvTable.committedSeqs(Paths.get(s"$root/m1"))
    assert(commits.size == 2, s"seed + merge commits: $commits")
    val mergeOps = new String(Files.readAllBytes(
      Paths.get(s"$root/m1/commit-${commits.last}.json")))
    assert(mergeOps.contains("\"ops\": 3"), s"touched-rows-only commit: $mergeOps")
    // untouched rows carry NO record in the merge commit's logs
    val logsOfLast = (0 until 4).flatMap { b =>
      graft.sources.v2.KvTable.bucketLogs(Paths.get(s"$root/m1"), b)
        .filter(_.getFileName.toString.startsWith(s"log-${commits.last}-"))
        .flatMap(p => Files.readAllLines(p).toArray.map(_.toString))
    }
    assert(logsOfLast.size == 3 && !logsOfLast.exists(_.contains("\"id\": 1,")),
      s"merge logs: $logsOfLast")
  }

  test("DELETE and UPDATE layer as further delta commits, last-wins") {
    seed("d1", Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0),
      (4L, "d", 4.0), (5L, "e", 5.0), (6L, "f", 6.0)))
    spark.sql(s"DELETE FROM $Cat.d1 WHERE id % 2 = 0")
    spark.sql(s"UPDATE $Cat.d1 SET value = value + 0.25 WHERE id >= 3")
    assert(state("d1") == Map(
      1L -> ("a", 1.0), 3L -> ("c", 3.25), 5L -> ("e", 5.25)))
    // three commits: seed, delete, update — each bounded by its touch set
    assert(graft.sources.v2.KvTable.committedSeqs(Paths.get(s"$root/d1")).size == 3)
  }

  test("uncommitted logs are invisible (marker written last)") {
    seed("t1", Seq((1L, "a", 1.0)))
    // simulate a torn commit: a log file lands without its marker
    val bucket = graft.sources.v2.KvTable.bucketOf(9L, 4)
    val bd = Paths.get(s"$root/t1/bucket=$bucket")
    Files.createDirectories(bd)
    Files.write(bd.resolve("log-99-0.jsonl"),
      """{"op": "I", "id": 9, "name": "ghost", "value": 9.0}""".getBytes)
    assert(state("t1") == Map(1L -> ("a", 1.0)), "torn commit must be invisible")
  }

  test("INSERT INTO appends through the plain write path") {
    seed("i1", Seq((1L, "a", 1.0)))
    spark.sql(s"INSERT INTO $Cat.i1 VALUES (2L, 'b', 2.0)")
    assert(state("i1") == Map(1L -> ("a", 1.0), 2L -> ("b", 2.0)))
  }

  test("changelog replay reconstructs the snapshot exactly") {
    seed("c2", Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
    spark.sql(s"DELETE FROM $Cat.c2 WHERE id = 2")
    spark.sql(s"UPDATE $Cat.c2 SET value = value * 2 WHERE id = 3")
    val log = spark.read.format("graft-kv")
      .option("path", s"$root/c2").option("buckets", 4)
      .option("changelog", true).load()
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getString(3),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))
    // exactly the operations the three commands performed
    assert(log.count(_._2 == "I") == 3 && log.count(_._2 == "D") == 1 &&
      log.count(_._2 == "U") == 1, s"ops: ${log.toSeq}")
    // fold the changelog in seq order last-wins -> must equal the scan
    val folded = log.sortBy(e => (e._1, e._3))
      .foldLeft(Map.empty[Long, (String, Double)]) {
        case (m, (_, "D", id, _, _)) => m - id
        case (m, (_, _, id, nm, v)) => m.updated(id, (nm, v))
      }
    assert(folded == state("c2"))
  }
}
