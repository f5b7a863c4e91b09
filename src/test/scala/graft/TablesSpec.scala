package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins `Tables.events` against ALL THREE physical `ts` vintages the
  * driver's fixture generator has produced across rounds (round-8
  * incident: a regeneration flipped the encoding and 18 queries died
  * before the adapter existed). Only the vintage currently on disk is
  * exercised by the oracle gate, so this spec feeds the other branches
  * synthetic fixture files and asserts every vintage converges to the
  * SAME TimestampType instants.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // two instants with sub-second parts, as UTC epoch micros
  private val micros = Seq(
    1705322096789000L, // 2024-01-15T12:34:56.789Z
    1717200000000001L) // 2024-06-01T00:00:00.000001Z

  private def writeFixture(makeTs: DataFrameColumn): String = {
    val dir = Files.createTempDirectory("graft_events_").toString
    val base = micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us, "click") }
      .toDF("user_id", "us", "event_type")
    base.select(col("user_id"), makeTs(col("us")).as("ts"), col("event_type"))
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }
  private type DataFrameColumn =
    org.apache.spark.sql.Column => org.apache.spark.sql.Column

  private def readInstants(dir: String): Seq[Timestamp] = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType,
      s"adapter must always yield TimestampType, got ${df.schema("ts")}")
    df.orderBy("user_id").collect().map(_.getAs[Timestamp]("ts")).toSeq
  }

  test("LongType epoch-nanos vintage converges (incl. sub-µs truncation)") {
    // +999 ns beyond the µs boundary must truncate DOWN (integer DIV),
    // matching DuckDB's ns→µs truncation
    val dir = writeFixture(us => (us * 1000 + 999).cast(LongType))
    val got = readInstants(dir)
    assert(got == micros.map(us => Timestamp.from(
      java.time.Instant.EPOCH.plusNanos(us * 1000))))
  }

  test("TIMESTAMP_NTZ vintage converges under the pinned UTC session") {
    val dir = writeFixture(us => timestamp_micros(us).cast(TimestampNTZType))
    // sanity: the fixture really is NTZ on disk
    assert(spark.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType == TimestampNTZType)
    val got = readInstants(dir)
    assert(got == micros.map(us => Timestamp.from(
      java.time.Instant.EPOCH.plusNanos(us * 1000))))
  }

  test("TimestampType vintage passes through untouched") {
    val dir = writeFixture(us => timestamp_micros(us))
    val got = readInstants(dir)
    assert(got == micros.map(us => Timestamp.from(
      java.time.Instant.EPOCH.plusNanos(us * 1000))))
  }

  test("an unrecognized physical type fails loudly, not silently") {
    val dir = writeFixture(us => us.cast(StringType))
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("unsupported physical type"))
  }

  test("all vintages agree with each other row-for-row") {
    val a = readInstants(writeFixture(us => (us * 1000).cast(LongType)))
    val b = readInstants(writeFixture(us =>
      timestamp_micros(us).cast(TimestampNTZType)))
    val c = readInstants(writeFixture(us => timestamp_micros(us)))
    assert(a == b && b == c)
  }
}
