package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The exactly-once CDC sink: txn-tagged commits make a redelivered
  * micro-batch a zero-op no-op, within-batch ops collapse to the
  * highest ver, and the SAME handler runs under a real MemoryStream.
  */
class KvCdcSinkSpec extends SparkSpec {
  import spark.implicits._
  implicit private lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private val Cat = "kv_cdc"
  private lazy val root: String = {
    val r = Files.createTempDirectory("kv_cdc_").toString
    spark.conf.set(s"spark.sql.catalog.$Cat",
      classOf[graft.sources.v2.KvCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$Cat.root", r)
    spark.conf.set(s"spark.sql.catalog.$Cat.buckets", "4")
    r
  }

  private def mkTable(t: String): String = {
    val r = root
    spark.sql(s"CREATE TABLE IF NOT EXISTS $Cat.$t " +
      "(id BIGINT, name STRING, value DOUBLE)")
    s"$r/$t"
  }

  private def state(t: String): Map[Long, (String, Double)] =
    spark.table(s"$Cat.$t").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap

  private def cdc(rows: (Long, String, Long, String, Double)*) =
    rows.toDF("ver", "op", "id", "name", "value")

  test("redelivered batch applies zero ops (txn ledger)") {
    val dir = mkTable("t1")
    val h = KvCdcSink.cdcUpsertHandler("s1", s"$Cat.t1", dir) _
    h(cdc((0L, "I", 1L, "a", 1.0), (0L, "I", 2L, "b", 2.0)), 0L)
    h(cdc((1L, "U", 1L, "a", 10.0), (1L, "D", 2L, null, 0.0)), 1L)
    val after = state("t1")
    assert(after == Map(1L -> ("a", 10.0)))
    val commits = graft.sources.v2.KvTable.committedSeqs(Paths.get(dir))
    // redelivery: same txn, even DIFFERENT bytes — suppressed entirely
    h(cdc((1L, "U", 1L, "a", 999.0)), 1L)
    assert(state("t1") == after)
    assert(graft.sources.v2.KvTable.committedSeqs(Paths.get(dir)) == commits,
      "a suppressed replay must not even write a commit")
    assert(graft.sources.v2.KvTable.committedTxns(Paths.get(dir)) ==
      Set("s1/0", "s1/1"))
    // a NEW batch id still applies
    h(cdc((2L, "U", 3L, "c", 3.0)), 2L)
    assert(state("t1") == Map(1L -> ("a", 10.0), 3L -> ("c", 3.0)))
  }

  test("within-batch ops collapse to the highest ver per key") {
    val dir = mkTable("t2")
    val h = KvCdcSink.cdcUpsertHandler("s2", s"$Cat.t2", dir) _
    // key 1: I then U then D (D wins); key 2: I then U (U wins)
    h(cdc((0L, "I", 1L, "a", 1.0), (1L, "U", 1L, "a", 11.0),
      (2L, "D", 1L, null, 0.0),
      (0L, "I", 2L, "b", 2.0), (1L, "U", 2L, "B", 22.0)), 0L)
    assert(state("t2") == Map(2L -> ("B", 22.0)))
  }

  test("the same handler runs exactly-once under a real stream") {
    val dir = mkTable("t3")
    val input = MemoryStream[(Long, String, Long, String, Double)]
    val q = input.toDF()
      .toDF("ver", "op", "id", "name", "value")
      .writeStream
      .foreachBatch(KvCdcSink.cdcUpsertHandler("s3", s"$Cat.t3", dir) _)
      .start()
    try {
      input.addData((0L, "I", 1L, "a", 1.0), (0L, "I", 2L, "b", 2.0))
      q.processAllAvailable()
      input.addData((1L, "D", 1L, "x", 0.0), (1L, "U", 3L, "c", 3.0))
      q.processAllAvailable()
      assert(state("t3") == Map(2L -> ("b", 2.0), 3L -> ("c", 3.0)))
      assert(graft.sources.v2.KvTable.committedTxns(Paths.get(dir)) ==
        Set("s3/0", "s3/1"))
    } finally q.stop()
  }
}
