package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Edge-case coverage the fixture gates cannot reach for q130/q131:
  * one-sided MV merge groups, and a join edge with a KNOWN partial key
  * overlap for the sketch estimate.
  */
class MvJoinCardSpec extends SparkSpec {
  import spark.implicits._

  test("q131 merge keeps one-sided groups with identity fill") {
    def frame(rows: Seq[(String, Long, String, String, String)]) =
      rows.toDF("o_orderpriority", "n", "t", "f", "l")
        .select(col("o_orderpriority"), col("n"),
          col("t").cast("decimal(38,10)"), col("f").cast("timestamp"),
          col("l").cast("timestamp"))
    val base = frame(Seq(
      ("BOTH", 2L, "10.005", "2024-01-01", "2024-02-01"),
      ("BASE_ONLY", 3L, "7.00", "2024-01-05", "2024-01-06")))
      .toDF("o_orderpriority", "b_n", "b_t", "b_f", "b_l")
    val delta = frame(Seq(
      ("BOTH", 1L, "0.005", "2023-12-25", "2024-03-01"),
      ("DELTA_ONLY", 4L, "1.25", "2024-04-01", "2024-04-02")))
      .toDF("o_orderpriority", "d_n", "d_t", "d_f", "d_l")
    val got = Warehouse.mvMerge(base, delta)
      .select(col("o_orderpriority"), col("n_orders"), col("total_price"),
        col("first_date").cast("string"), col("last_date").cast("string"))
      .as[(String, Long, Double, String, String)].collect().toSeq
    assert(got == Seq(
      ("BASE_ONLY", 3L, 7.0, "2024-01-05 00:00:00", "2024-01-06 00:00:00"),
      // 10.005 + 0.005 = 10.01 EXACTLY in decimal — a double-summed
      // merge would sit on a rounding boundary here
      ("BOTH", 3L, 10.01, "2023-12-25 00:00:00", "2024-03-01 00:00:00"),
      ("DELTA_ONLY", 4L, 1.25, "2024-04-01 00:00:00", "2024-04-02 00:00:00")),
      s"merge mismatch: $got")
  }

  test("q130 fixture verdicts certify a true partial overlap, not just full containment") {
    // the FK edges are referentially intact (overlap == child keys), so
    // also pin the estimate machinery on a planted PARTIAL overlap:
    // 0..999 vs 500..1499 → exact overlap 500
    val a = (0L until 1000L).toDF("k")
    val b = (500L until 1500L).toDF("k")
    val skA = a.agg(theta_sketch_agg(col("k"), 16).as("sk")).withColumn("j", lit(1))
    val skB = b.agg(theta_sketch_agg(col("k"), 16).as("sk")).withColumn("j", lit(1))
    val est = skA.join(skB.select(col("j"), col("sk").as("sk_b")), Seq("j"))
      .select(theta_sketch_estimate(theta_intersection(col("sk"), col("sk_b"))))
      .as[Double].head()
    assert(math.abs(est - 500.0) < 1e-6,
      s"exact-mode theta intersection must be exact: $est")
  }
}
