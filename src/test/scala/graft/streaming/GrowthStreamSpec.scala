package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Streaming growth accounting equals its batch twin: the incremental
  * flatMapGroupsWithState classifier fed the fixture in ts-ordered
  * micro-batches must reproduce q170's daily DAU decomposition exactly
  * — the Dataset-API batch/stream symmetry argument, asserted.
  */
class GrowthStreamSpec extends SparkSpec {
  import spark.implicits._
  implicit private lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private val d = "/root/testdata/sf0.001"

  test("streaming growth classification matches the q170 batch ledger") {
    val fixture = graft.Tables.events(spark, d)
      .select($"ts", $"user_id", $"event_type", $"value")
      .as[EventStreams.Event].collect().toSeq
      .sortBy(_.ts.getTime)
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.growthAccounting(spark, input.toDS())
      .writeStream.format("memory").queryName("growth_test")
      .outputMode(OutputMode.Append).start()
    try {
      // three ts-ordered micro-batches: per-user day order is preserved,
      // which is the operator's documented arrival contract
      fixture.grouped((fixture.size + 2) / 3).foreach { batch =>
        input.addData(batch)
        q.processAllAvailable()
      }
      val streamed = spark.table("growth_test")
        .as[(Long, Long, String)].collect().toSeq
      // one classification per active (user, day)
      assert(streamed.map(r => (r._1, r._2)).distinct.size == streamed.size)
      val daily = streamed.groupBy(_._2).view.mapValues { rs =>
        (rs.size.toLong, rs.count(_._3 == "new").toLong,
          rs.count(_._3 == "retained").toLong,
          rs.count(_._3 == "resurrected").toLong)
      }.toMap
      val batchLedger = graft.queries.Warehouse.q170GrowthAccounting(spark, d)
        .select($"day".cast("string"), $"dau", $"new_users", $"retained",
          $"resurrected")
        .as[(String, Long, Long, Long, Long)].collect().toSeq
      assert(batchLedger.nonEmpty)
      batchLedger.foreach { case (day, dau, nw, ret, res) =>
        val ed = java.time.LocalDate.parse(day).toEpochDay
        assert(daily.get(ed).contains((dau, nw, ret, res)),
          s"day $day: streaming ${daily.get(ed)} vs batch ($dau,$nw,$ret,$res)")
      }
      assert(daily.keySet ==
        batchLedger.map(r => java.time.LocalDate.parse(r._1).toEpochDay).toSet)
    } finally q.stop()
  }
}
