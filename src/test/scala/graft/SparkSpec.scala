package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared per-suite SparkSession (local[4], tiny shuffle fan-out — the
  * fixtures are small and a 200-partition default would be all overhead).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  /** The engine's argmax-assignment quantization (LlmOps.ArgmaxGrid):
    * `round(csim · 2⁴⁰)` half-away-from-zero — spec replays of the cell
    * assignment must rank on this integer, not the raw double. */
  def qGrid(x: Double): Long =
    BigDecimal.valueOf(x * 1099511627776.0d)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  override def afterAll(): Unit = {
    // session is shared across suites in one forked JVM; do not stop it.
    super.afterAll()
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet is TIMESTAMP(NANOS) — see Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh_").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
