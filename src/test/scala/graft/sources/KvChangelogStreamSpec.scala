package graft.sources

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** The kv changelog as a DSv2 micro-batch source: offsets are commit
  * sequence numbers, each trigger delivers exactly the new commits
  * (no replay, no loss), and a restart from checkpoint resumes after
  * the last applied commit.
  */
class KvChangelogStreamSpec extends SparkSpec {
  import spark.implicits._

  private val Cat = "kv_cls"
  private lazy val root: String = {
    val r = Files.createTempDirectory("kv_cls_").toString
    spark.conf.set(s"spark.sql.catalog.$Cat",
      classOf[graft.sources.v2.KvCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$Cat.root", r)
    spark.conf.set(s"spark.sql.catalog.$Cat.buckets", "4")
    r
  }

  test("each trigger delivers exactly the new commits; checkpoint resumes") {
    val r = root
    spark.sql(s"CREATE TABLE IF NOT EXISTS $Cat.s1 " +
      "(id BIGINT, name STRING, value DOUBLE)")
    Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("id", "name", "value").write.format("graft-kv")
      .option("path", s"$root/s1").option("buckets", 4)
      .mode("overwrite").save()                       // commit 0

    val ckpt = Files.createTempDirectory("kv_cls_ck_").toString
    // (batchId, seq, op, id) accumulated across triggers and restarts
    val seen = mutable.ArrayBuffer.empty[(Long, Long, String, Long)]
    def start() = spark.readStream.format("graft-kv")
      .option("path", s"$root/s1").option("buckets", 4)
      .option("changelog", true).load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, bid: Long) =>
        seen.synchronized {
          seen ++= df.collect().map(x =>
            (bid, x.getLong(0), x.getString(1), x.getLong(2)))
        }
        ()
      }.start()

    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(seen.map(x => (x._2, x._3, x._4)).sortBy(x => (x._1, x._3)) ==
        Seq((0L, "I", 1L), (0L, "I", 2L), (0L, "I", 3L)))
      val batchesAfterSeed = seen.map(_._1).distinct.size
      spark.sql(s"DELETE FROM $Cat.s1 WHERE id = 2")   // commit 1
      q1.processAllAvailable()
      assert(seen.count(_._3 == "D") == 1 &&
        seen.count(_._2 == 0L) == 3, "commit 0 must NOT be redelivered")
      // an idle trigger (no new commit) produces no rows
      val n = seen.size
      q1.processAllAvailable()
      assert(seen.size == n)
    } finally q1.stop()

    // commits landing while the stream is DOWN are picked up on
    // restart from the checkpoint — and nothing before them replays
    spark.sql(s"UPDATE $Cat.s1 SET value = value + 0.5 WHERE id = 3")
    val before = seen.size
    val q2 = start()
    try {
      q2.processAllAvailable()
      val fresh = seen.drop(before)
      assert(fresh.map(x => (x._2, x._3, x._4)) == Seq((2L, "U", 3L)),
        s"restart must deliver exactly commit 2, got $fresh")
    } finally q2.stop()

    // full accounting: every committed op delivered exactly once
    assert(seen.map(x => (x._2, x._3, x._4)).sorted ==
      Seq((0L, "I", 1L), (0L, "I", 2L), (0L, "I", 3L),
        (1L, "D", 2L), (2L, "U", 3L)))
  }

  test("Trigger.AvailableNow drains an uncommitted batch plus commits to " +
    "the start-time bound, then stops (SupportsTriggerAvailableNow)") {
    val r = root
    spark.sql(s"CREATE TABLE IF NOT EXISTS $Cat.an1 " +
      "(id BIGINT, name STRING, value DOUBLE)")
    Seq((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("id", "name", "value").write.format("graft-kv")
      .option("path", s"$root/an1").option("buckets", 4)
      .mode("overwrite").save()                       // commit 0
    val ckpt = Files.createTempDirectory("kv_an_ck_").toString
    val seen = mutable.ArrayBuffer.empty[(Long, Long, String, Long)]
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-kv")
        .option("path", s"$root/an1").option("buckets", 4)
        .option("changelog", true).load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, bid: Long) =>
          seen.synchronized {
            seen ++= df.collect().map(x =>
              (bid, x.getLong(0), x.getString(1), x.getLong(2)))
          }
          ()
        }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce() // batch 0 = commit 0
    spark.sql(s"DELETE FROM $Cat.an1 WHERE id = 2")   // commit 1
    runOnce() // batch 1 = commit 1
    assert(seen.map(x => (x._3, x._4)).sorted ==
      Seq(("D", 2L), ("I", 1L), ("I", 2L)))
    // plant the crash: batch 1's commit marker gone, offset entry kept
    // (including the hidden Hadoop .crc shadow, which would block the
    // recovery run's re-commit rename on the local FS)
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$ckpt/commits/1"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$ckpt/commits/.1.crc"))
    spark.sql(s"UPDATE $Cat.an1 SET value = 9.0 WHERE id = 1") // commit 2
    val before = seen.size
    runOnce()
    val fresh = seen.drop(before)
    assert(fresh.map(x => (x._1, x._2, x._3, x._4)) ==
      Seq((1L, 1L, "D", 2L), (2L, 2L, "U", 1L)),
      s"drain must replay the uncommitted batch then reach the bound: $fresh")
    // drained: an idle AvailableNow run adds nothing
    val n = seen.size
    runOnce()
    assert(seen.size == n)
  }

  test("a stream behind the compaction floor resumes onto collapsed history") {
    val r = root
    spark.sql(s"CREATE TABLE IF NOT EXISTS $Cat.cf1 " +
      "(id BIGINT, name STRING, value DOUBLE)")
    Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("id", "name", "value").write.format("graft-kv")
      .option("path", s"$root/cf1").option("buckets", 4)
      .mode("overwrite").save()                       // commit 0
    val ckpt = Files.createTempDirectory("kv_cf_ck_").toString
    val seen = mutable.ArrayBuffer.empty[(Long, String, Long)]
    def start() = spark.readStream.format("graft-kv")
      .option("path", s"$root/cf1").option("buckets", 4)
      .option("changelog", true).load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, _: Long) =>
        seen.synchronized {
          seen ++= df.collect().map(x =>
            (x.getLong(0), x.getString(1), x.getLong(2)))
        }
        ()
      }.start()
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(seen.size == 3 && seen.forall(_._1 == 0L))
    // while the stream is DOWN: two more commits, then compaction
    // retires their logs (seq 1, 2 gone; seq 3 = the compacted fold)
    spark.sql(s"DELETE FROM $Cat.cf1 WHERE id = 2")   // commit 1
    spark.sql(s"UPDATE $Cat.cf1 SET value = value * 2 WHERE id = 3") // 2
    graft.sources.v2.KvTable.compact(spark, s"$root/cf1", buckets = 4)
    val before = seen.size
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    val fresh = seen.drop(before)
    // the retention contract: the stream sees the COLLAPSED history —
    // only the compacted commit's I records (seqs 1-2 are gone)
    assert(fresh.nonEmpty && fresh.forall(x => x._1 == 3L && x._2 == "I"),
      s"expected only compacted I records, got $fresh")
    // and those records are BY THEMSELVES the full current snapshot …
    assert(fresh.map(_._3).toSet ==
      spark.table(s"$Cat.cf1").collect().map(_.getLong(0)).toSet)
    // … while merely LAYERING them onto pre-compaction state is WRONG:
    // the collapsed delete of id 2 never reaches a consumer that was
    // behind the floor — the reason a compacted resume must be treated
    // as a snapshot RESET (discard local state, apply the batch whole),
    // exactly the Delta-VACUUM retention tradeoff the scaladoc states
    val layered = (seen.take(before) ++ fresh)
      .foldLeft(Map.empty[Long, Long]) { case (m, (_, op, id)) =>
        if (op == "D") m - id else m + (id -> id)
      }
    assert(layered.keySet.contains(2L),
      "collapsed deletes are invisible to layering — the hazard is real")
  }

  test("live replication: changelog stream + CDC sink mirror the source") {
    val r = root
    def state(t: String): Map[Long, (String, Double)] =
      spark.table(s"$Cat.$t").collect()
        .map(x => x.getLong(0) -> ((x.getString(1), x.getDouble(2)))).toMap
    spark.sql(s"CREATE TABLE IF NOT EXISTS $Cat.rsrc " +
      "(id BIGINT, name STRING, value DOUBLE)")
    spark.sql(s"CREATE TABLE IF NOT EXISTS $Cat.rdst " +
      "(id BIGINT, name STRING, value DOUBLE)")
    Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0), (4L, "d", 4.0))
      .toDF("id", "name", "value").write.format("graft-kv")
      .option("path", s"$root/rsrc").option("buckets", 4)
      .mode("overwrite").save()
    val ckpt = Files.createTempDirectory("kv_repl_ck_").toString
    val handler = graft.streaming.KvCdcSink
      .cdcUpsertHandler("repl", s"$Cat.rdst", s"$root/rdst") _
    def start() = spark.readStream.format("graft-kv")
      .option("path", s"$root/rsrc").option("buckets", 4)
      .option("changelog", true).load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, bid: Long) =>
        handler(df.selectExpr("seq AS ver", "op", "id", "name", "value"), bid)
      }.start()
    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(state("rdst") == state("rsrc"))
      spark.sql(s"DELETE FROM $Cat.rsrc WHERE id % 2 = 0")
      q1.processAllAvailable()
      assert(state("rdst") == state("rsrc"))
    } finally q1.stop()
    // writes landing while the replica stream is down catch up on restart
    spark.sql(s"UPDATE $Cat.rsrc SET value = value * 3 WHERE id = 1")
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(state("rdst") == state("rsrc"))
      assert(state("rdst") == Map(1L -> ("a", 3.0), 3L -> ("c", 3.0)))
    } finally q2.stop()
  }

  test("withExt streaming: the widened feed carries evolved columns per trigger") {
    val r = root
    spark.sql(s"CREATE TABLE IF NOT EXISTS $Cat.we " +
      "(id BIGINT, name STRING, value DOUBLE)")
    Seq((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("id", "name", "value").write.format("graft-kv")
      .option("path", s"$root/we").option("buckets", 4)
      .mode("overwrite").save()                       // commit 0, pre-ALTER
    spark.sql(s"ALTER TABLE $Cat.we ADD COLUMN tier STRING")
    Seq((3L, "c", 3.0, "gold")).toDF("id", "name", "value", "tier")
      .createOrReplaceTempView("we_src")
    spark.sql(
      s"""MERGE INTO $Cat.we t USING we_src s ON t.id = s.id
         |WHEN NOT MATCHED THEN
         |  INSERT (id, name, value, tier) VALUES (s.id, s.name, s.value, s.tier)
         |""".stripMargin)                            // commit 1, widened
    val seen = mutable.ArrayBuffer.empty[(Long, Long, String)]
    val q = spark.readStream.format("graft-kv")
      .option("path", s"$root/we").option("buckets", 4)
      .option("changelog", true).option("withExt", true).load()
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("kv_we_ck_").toString)
      .foreachBatch { (df: DataFrame, _: Long) =>
        assert(df.columns.toSeq ==
          Seq("seq", "op", "id", "name", "value", "tier"))
        seen.synchronized {
          seen ++= df.collect().map(x =>
            (x.getLong(0), x.getLong(2),
              if (x.isNullAt(5)) null else x.getString(5)))
        }
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(seen.sortBy(x => (x._1, x._2)) == Seq(
        (0L, 1L, null), (0L, 2L, null), (1L, 3L, "gold")),
        s"widened stream rows: $seen")
    } finally q.stop()
  }
}
