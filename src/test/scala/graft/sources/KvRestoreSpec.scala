package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `KvTable.restore` — write-side time travel: the head becomes a
  * retained snapshot via ONE replay commit, history stays readable,
  * restore-to-head is a no-op, a compacted-away target fails loudly,
  * and evolved columns revert to their as-of values (NULL before their
  * ALTER) while the schema stays widened.
  */
class KvRestoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("kv_restore_").toString

  private def write(path: String, rows: Seq[(Long, String, Double)]): Unit =
    rows.toDF("id", "name", "value").write.format("graft-kv")
      .option("path", path).option("buckets", 4).mode("append").save()

  private def readAt(path: String, asOf: Option[Long] = None) = {
    val r = spark.read.format("graft-kv").option("path", path)
    asOf.foreach(v => r.option("asOfSeq", v))
    r.load().select("id", "name", "value").orderBy("id")
      .as[(Long, String, Double)].collect().toSeq
  }

  test("restore makes head equal the target snapshot; history stays readable; marker recorded") {
    val p = freshDir()
    write(p, Seq((1L, "a", 1.0), (2L, "b", 2.0)))            // seq 0
    write(p, Seq((2L, "b2", 20.0), (3L, "c", 3.0)))          // seq 1
    write(p, Seq((1L, "a2", 10.0), (4L, "d", 4.0)))          // seq 2
    val atOne = readAt(p, Some(1L))
    val atTwo = readAt(p)
    graft.sources.v2.KvTable.restore(spark, p, asOfSeq = 1L, buckets = 4)
    assert(readAt(p) == atOne, "head after restore must equal the snapshot")
    // keys born after the target (4) are gone; last-wins reverted (1 -> a)
    assert(readAt(p).map(_._1) == Seq(1L, 2L, 3L))
    // history preserved: the pre-restore head is still servable
    assert(readAt(p, Some(2L)) == atTwo,
      "pre-restore versions must stay readable")
    // the restore is an auditable commit
    val hist = spark.read.format("graft-kv").option("path", p)
      .option("history", true).load()
      .select("seq", "query").as[(Long, String)].collect().toMap
    assert(hist(3L) == "restore", s"history must record the restore: $hist")
  }

  test("restore to the current head is a no-op (no empty commit)") {
    val p = freshDir()
    write(p, Seq((1L, "a", 1.0)))
    write(p, Seq((2L, "b", 2.0)))
    val before = graft.sources.v2.KvTable.committedSeqs(
      java.nio.file.Paths.get(p))
    graft.sources.v2.KvTable.restore(spark, p, asOfSeq = before.last,
      buckets = 4)
    val after = graft.sources.v2.KvTable.committedSeqs(
      java.nio.file.Paths.get(p))
    assert(after == before, "restoring to head must not write a commit")
  }

  test("a compacted-away target fails loudly at validateAsOf") {
    val p = freshDir()
    write(p, Seq((1L, "a", 1.0)))
    write(p, Seq((1L, "a2", 2.0)))
    graft.sources.v2.KvTable.compact(spark, p, buckets = 4)
    val e = intercept[IllegalArgumentException](
      graft.sources.v2.KvTable.restore(spark, p, asOfSeq = 0L, buckets = 4))
    assert(e.getMessage.contains("compaction"), e.getMessage)
  }

  test("evolved columns revert to their as-of values; the schema stays widened") {
    val p = freshDir()
    write(p, Seq((1L, "a", 1.0), (2L, "b", 2.0)))            // seq 0
    graft.sources.v2.KvTable.addColumn(java.nio.file.Paths.get(p),
      "bonus", org.apache.spark.sql.types.LongType)
    Seq((2L, "b2", 20.0, 7L), (3L, "c", 3.0, 9L))
      .toDF("id", "name", "value", "bonus").write.format("graft-kv")
      .option("path", p).option("buckets", 4).mode("append").save() // seq 1
    graft.sources.v2.KvTable.restore(spark, p, asOfSeq = 0L, buckets = 4)
    val head = spark.read.format("graft-kv").option("path", p).load()
      .select("id", "bonus").orderBy("id")
      .as[(Long, Option[Long])].collect().toSeq
    // pre-ALTER snapshot: only ids 1,2 and bonus NULL — but the head
    // SCHEMA still carries the column (ADD COLUMN is metadata, not data)
    assert(head == Seq((1L, None), (2L, None)), s"got $head")
    // the evolved snapshot is still history-readable with its values
    val atOne = spark.read.format("graft-kv").option("path", p)
      .option("asOfSeq", 1).load()
      .select("id", "bonus").orderBy("id")
      .as[(Long, Option[Long])].collect().toSeq
    assert(atOne == Seq((1L, None), (2L, Some(7L)), (3L, Some(9L))))
  }
}
