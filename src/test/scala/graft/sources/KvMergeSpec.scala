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

  test("compaction preserves the state and collapses the log") {
    seed("cp1", Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0),
      (4L, "d", 4.0), (5L, "e", 5.0)))
    spark.sql(s"DELETE FROM $Cat.cp1 WHERE id = 2")
    spark.sql(s"UPDATE $Cat.cp1 SET value = value + 0.5 WHERE id >= 4")
    val before = state("cp1")
    graft.sources.v2.KvTable.compact(spark, s"$root/cp1", buckets = 4)
    assert(state("cp1") == before, "compaction must not change the table")
    // history collapsed: at most one log file per bucket, all at the
    // compacted sequence, and only I records remain
    val dir = Paths.get(s"$root/cp1")
    val seqs = graft.sources.v2.KvTable.committedSeqs(dir)
    (0 until 4).foreach { b =>
      val logs = graft.sources.v2.KvTable.bucketLogs(dir, b)
      assert(logs.size <= 1, s"bucket $b: $logs")
      logs.foreach { p =>
        assert(p.getFileName.toString.startsWith(s"log-${seqs.last}-"))
        Files.readAllLines(p).forEach(l => assert(l.contains("\"op\": \"I\"")))
      }
    }
    // and further commits keep layering normally
    spark.sql(s"DELETE FROM $Cat.cp1 WHERE id = 5")
    assert(state("cp1") == before - 5L)
  }

  test("asOfSeq time travel serves every retained snapshot, read-only") {
    seed("tt1", Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0),
      (4L, "d", 4.0)))
    val snap0 = state("tt1")
    spark.sql(s"DELETE FROM $Cat.tt1 WHERE id = 2")
    val snap1 = state("tt1")
    spark.sql(s"UPDATE $Cat.tt1 SET value = value * 2 WHERE id >= 3")
    val snap2 = state("tt1")
    assert(snap0 != snap1 && snap1 != snap2)
    def asOf(k: Long): Map[Long, (String, Double)] =
      spark.read.format("graft-kv").option("path", s"$root/tt1")
        .option("buckets", 4).option("asOfSeq", k).load().collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(asOf(0) == snap0 && asOf(1) == snap1 && asOf(2) == snap2)
    // SQL surface resolves through the catalog's versioned loadTable
    assert(spark.sql(s"SELECT sum(value) FROM $Cat.tt1 VERSION AS OF 1")
      .head.getDouble(0) == snap1.values.map(_._2).sum)
    // a version that never committed fails at plan time
    val e1 = intercept[Exception](asOf(9))
    assert(e1.getMessage.contains("does not exist"), e1.getMessage)
    // an as-of table is read-only (capability gate or the builder's
    // own require — either refusal is plan-time)
    val e2 = intercept[Exception](
      Seq((9L, "z", 9.0)).toDF("id", "name", "value").write
        .format("graft-kv").option("path", s"$root/tt1")
        .option("buckets", 4).option("asOfSeq", 1)
        .mode("append").save())
    assert(e2.getMessage.contains("read-only") ||
      e2.getMessage.toLowerCase.contains("does not support") ||
      e2.getMessage.toLowerCase.contains("does not allow"), e2.getMessage)
    // changelog truncates at asOf too
    val cl = spark.read.format("graft-kv").option("path", s"$root/tt1")
      .option("buckets", 4).option("changelog", true)
      .option("asOfSeq", 1).load().collect()
    assert(cl.map(_.getLong(0)).forall(_ <= 1L) &&
      cl.count(_.getString(1) == "D") == 1)
    // compaction collapses history: earlier versions become unservable,
    // the compacted version itself (and later commits) keep working
    graft.sources.v2.KvTable.compact(spark, s"$root/tt1", buckets = 4)
    val e3 = intercept[Exception](asOf(2))
    assert(e3.getMessage.contains("compaction"), e3.getMessage)
    assert(asOf(3) == snap2)
  }

  test("a held commit lock makes a concurrent writer fail loudly") {
    seed("lk1", Seq((1L, "a", 1.0), (2L, "b", 2.0)))
    val lock = Paths.get(s"$root/lk1/_commit.lock")
    Files.write(lock, "other-writer".getBytes)
    val e = intercept[Exception](
      spark.sql(s"DELETE FROM $Cat.lk1 WHERE id = 1"))
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("concurrent commit") && msg.contains("other-writer"),
      s"got: $msg")
    // nothing committed, table unchanged
    assert(state("lk1") == Map(1L -> ("a", 1.0), 2L -> ("b", 2.0)))
    // lock released → writes resume; the lock itself is gone afterwards
    Files.delete(lock)
    spark.sql(s"DELETE FROM $Cat.lk1 WHERE id = 1")
    assert(state("lk1") == Map(2L -> ("b", 2.0)))
    assert(!Files.exists(lock), "commit must release its lock")
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
