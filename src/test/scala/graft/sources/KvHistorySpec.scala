package graft.sources

import graft.SparkSpec

/** The `option("history", true)` audit surface: one row per commit
  * marker with ops/fence/txn/compaction — the operator's "what landed,
  * under which fencing token, did batch N's txn commit?" read, answered
  * from marker metadata alone.
  */
class KvHistorySpec extends SparkSpec {
  import spark.implicits._

  private val Cat = "kv_hist"
  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("kv_hist_").toString
    spark.conf.set(s"spark.sql.catalog.$Cat",
      classOf[graft.sources.v2.KvCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$Cat.root", r)
    spark.conf.set(s"spark.sql.catalog.$Cat.buckets", "4")
    r
  }

  test("history rows carry ops, monotone fences, txn tags, and the compaction flag") {
    val r = root
    spark.sql(s"CREATE TABLE IF NOT EXISTS $Cat.h1 " +
      "(id BIGINT, name STRING, value DOUBLE)")
    // commit 0: plain seed
    Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("id", "name", "value").write.format("graft-kv")
      .option("path", s"$root/h1").option("buckets", 4)
      .mode("overwrite").save()
    // commit 1: txn-tagged delete (the KvCdcSink channel)
    spark.conf.set("graft.kv.txn", "batch-7")
    try spark.sql(s"DELETE FROM $Cat.h1 WHERE id = 2")
    finally spark.conf.unset("graft.kv.txn")
    // commit 2: compaction
    graft.sources.v2.KvTable.compact(spark, s"$root/h1", buckets = 4)

    val hist = spark.read.format("graft-kv")
      .option("path", s"$root/h1").option("history", true).load()
      .as[(Long, Long, String, Option[Long], Option[String], Boolean)]
      .collect().sortBy(_._1)
    assert(hist.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(hist.map(_._2).toSeq == Seq(3L, 1L, 2L),
      s"ops per commit (seed 3, delete 1, compacted survivors 2): $hist")
    assert(hist.map(_._6).toSeq == Seq(false, false, true))
    // fences recorded and monotone non-decreasing across commits
    val fences = hist.flatMap(_._4)
    assert(fences.length == 3 && fences.sameElements(fences.sorted), hist.toSeq)
    // the txn tag rode exactly the tagged commit's marker
    assert(hist.map(_._5).toSeq == Seq(None, Some("batch-7"), None))
  }
}
