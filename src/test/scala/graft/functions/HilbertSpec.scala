package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The Hilbert-curve kernel and expression: space-filling bijection,
  * the continuity property that motivates it over Morton, and the
  * audit contrast q215 reports.
  */
class HilbertSpec extends SparkSpec {
  import spark.implicits._

  private val Bits = 4
  private val N = 1 << Bits

  private def grid = (for (x <- 0 until N; y <- 0 until N) yield (x.toLong, y.toLong))
    .toDF("x", "y")

  test("hilbert_code is a bijection onto [0, 4^bits)") {
    val ds = grid.select(ZOrder.hilbertCol(col("x"), col("y"), Bits).as("d"))
      .collect().map(_.getLong(0)).sorted
    assert(ds.toSeq == (0L until (N.toLong * N)).toSeq)
  }

  test("the full curve is CONTINUOUS: every consecutive step is Manhattan 1") {
    val byD = grid.select(col("x"), col("y"),
      ZOrder.hilbertCol(col("x"), col("y"), Bits).as("d"))
      .collect().map(r => r.getLong(2) -> ((r.getLong(0), r.getLong(1))))
      .sortBy(_._1).map(_._2)
    byD.sliding(2).foreach { case Array((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between ($x1,$y1) and ($x2,$y2)")
    }
    // ...which the Z curve is NOT: its largest step is the diagonal
    // leap across the grid's halves
    val byZ = grid.select(col("x"), col("y"),
      ZOrder.morton(col("x"), col("y"), Bits).as("z"))
      .collect().map(r => r.getLong(2) -> ((r.getLong(0), r.getLong(1))))
      .sortBy(_._1).map(_._2)
    val zMax = byZ.sliding(2).map { case Array((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }.max
    // crossing the upper half: x rewinds the full width (N-1) while y
    // advances 1 — the classic Z-curve discontinuity
    assert(zMax == N.toLong,
      s"morton's worst step should be the half-crossing leap N, got $zMax")
  }

  test("expression matches the kernel and the generated SQL walk") {
    val rows = grid.select(col("x"), col("y"),
      ZOrder.hilbertCol(col("x"), col("y"), Bits).as("d")).collect()
    rows.foreach { r =>
      assert(r.getLong(2) == ZOrder.hilbert(r.getLong(0), r.getLong(1), Bits))
    }
    // the CTE generator replays the identical trajectory in Spark SQL
    // (same arithmetic DuckDB runs in the q215 oracle) — REPLACE is not
    // Spark syntax, so rebuild the per-round updates as chained views
    grid.createOrReplaceTempView("hilbert_grid")
    var cur = "SELECT x, y, CAST(x AS BIGINT) AS hx, CAST(y AS BIGINT) AS hy, " +
      "CAST(0 AS BIGINT) AS hd FROM hilbert_grid"
    for (lvl <- Bits - 1 to 0 by -1) {
      val s = 1L << lvl
      val digit = s"CASE WHEN (hx & $s) = 0 AND (hy & $s) = 0 THEN 0 " +
        s"WHEN (hx & $s) = 0 THEN 1 WHEN (hy & $s) = 0 THEN 3 ELSE 2 END"
      cur = s"""SELECT x, y,
        CASE WHEN (hy & $s) = 0 THEN
            CASE WHEN (hx & $s) > 0 THEN ${s - 1} - hy ELSE hy END
          ELSE hx END AS hx,
        CASE WHEN (hy & $s) = 0 THEN
            CASE WHEN (hx & $s) > 0 THEN ${s - 1} - hx ELSE hx END
          ELSE hy END AS hy,
        hd + ${s * s} * ($digit) AS hd FROM ($cur)"""
    }
    val sqlD = spark.sql(s"SELECT x, y, hd FROM ($cur)")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { r =>
      assert(sqlD((r.getLong(0), r.getLong(1))) == r.getLong(2))
    }
  }
}
