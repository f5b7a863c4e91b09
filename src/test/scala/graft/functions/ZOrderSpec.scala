package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

/** Kernel properties of the Morton interleave (pure JVM). */
class ZOrderKernelSpec extends AnyFunSuite {

  test("interleave/deinterleave round-trip over the full 8-bit grid") {
    for (x <- 0L until 256L; y <- 0L until 256L) {
      val z = ZOrder.interleave(x, y, 8)
      assert(ZOrder.deinterleave(z, 8) == ((x, y)), s"($x, $y)")
    }
  }

  test("curve locality: equal z-prefix implies equal coordinate prefixes") {
    // sharing the top 2k z bits = same level-k quadrant = each coordinate
    // confined to a 2^(bits-k)-wide band — the pruning property
    val bits = 8
    for (k <- 1 to 4; x <- Seq(0L, 37L, 128L, 255L); y <- Seq(0L, 99L, 200L)) {
      val z = ZOrder.interleave(x, y, bits)
      val quad = z >>> (2 * (bits - k))
      val (qx, qy) = ZOrder.deinterleave(quad, k)
      assert(qx == (x >>> (bits - k)) && qy == (y >>> (bits - k)))
    }
  }

  test("high bits beyond `bits` are masked off, not smeared") {
    assert(ZOrder.interleave(0x1FFL, 0L, 8) == ZOrder.interleave(0xFFL, 0L, 8))
  }
}

/** The layout claim itself, on fixture data. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("z-blocks bound BOTH key spans; a single-column sort leaves the second full-width") {
    val tiles = graft.queries.Warehouse.q74ZorderAudit(spark, d)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(tiles.length > 8, "the quantized curve must populate most level-2 blocks")
    val ext = Tables.lineitem(spark, d)
      .agg(min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey")).head()
    val pRange = (ext.getLong(1) - ext.getLong(0)).toDouble
    val sRange = (ext.getLong(3) - ext.getLong(2)).toDouble
    // level-2 quadrants confine each quantized dim to 1/4 of its range;
    // quantization granularity adds ≤ range/qmax slack per edge
    val pSpans = tiles.map(t => (t._4 - t._3) / pRange)
    val sSpans = tiles.map(t => (t._6 - t._5) / sRange)
    assert(pSpans.max <= 0.30, s"partkey span per z-block: ${pSpans.max}")
    assert(sSpans.max <= 0.30, s"suppkey span per z-block: ${sSpans.max}")
    // contrast: equal-count runs of a partkey-ONLY sort leave suppkey
    // effectively full-width in every run
    val pairs = Tables.lineitem(spark, d).select("l_partkey", "l_suppkey").distinct()
    val n = pairs.count()
    val runSpans = pairs
      .withColumn("run",
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("l_partkey"), col("l_suppkey"))) * 16 / (n + 1)).cast("long"))
      .groupBy("run")
      .agg(((max("l_suppkey") - min("l_suppkey")) / sRange).as("span"))
      .agg(avg("span")).head().getDouble(0)
    assert(runSpans >= 0.8,
      s"single-column sort should leave suppkey near full-width, got $runSpans")
  }

  test("morton_code is registered as a SQL function") {
    graft.GraftExtensions.register(spark)
    val got = spark.sql("SELECT morton_code(5L, 3L, 8)").head().getLong(0)
    assert(got == ZOrder.interleave(5L, 3L, 8))
  }
}
