package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExactDecimalSpec extends SparkSpec {
  import spark.implicits._

  private def reference(x: Double): Long =
    new JBigDecimal(x).setScale(6, RoundingMode.HALF_UP).unscaledValue().longValueExact()

  test("compute == BigDecimal HALF_UP unscaled on adversarial and random doubles") {
    val rng = new scala.util.Random(7)
    val adversarial = Seq(
      0.0, -0.0, 1.0, -1.0, 0.1, -0.1, 0.015, 0.0049999, 1e-7, -1e-7,
      4.9e-7, 5.1e-7, 2.5e-7, // sub-granularity rounding
      1.2345675, -1.2345675, // near half at scale 6 (binary value decides)
      104949.5, 95949.015, 1.2e10, // money-grade + p² magnitudes
      java.lang.Double.MIN_VALUE, -java.lang.Double.MIN_VALUE, // denormals
      2.3456789012e12) // near decimal(18,6) integral bound
    val randomMoney = Seq.fill(20000)(rng.nextInt(12000000) / 100.0 * (if (rng.nextBoolean()) 1 else -1))
    val randomProducts = Seq.fill(20000)(rng.nextInt(12000000) / 100.0 * (rng.nextInt(12000000) / 100.0))
    val randomWide = Seq.fill(20000)(java.lang.Math.scalb(rng.nextDouble() * 2 - 1, rng.nextInt(60) - 30))
    (adversarial ++ randomMoney ++ randomProducts ++ randomWide).foreach { x =>
      assert(ExactDecimal.compute(x) == reference(x), s"compute($x)")
    }
  }

  test("compute at scale 10 matches BigDecimal; raw money columns round-trip the scale-10 cast") {
    def ref10(x: Double): Long =
      new JBigDecimal(x).setScale(10, RoundingMode.HALF_UP).unscaledValue().longValueExact()
    val rng = new scala.util.Random(11)
    (Seq(0.0, 1.0, 0.01, 104949.5, 1.2e5, 4.9e-11, 5.1e-11) ++
      Seq.fill(20000)(rng.nextInt(12000000) / 100.0)).foreach { x =>
      assert(ExactDecimal.compute(x, 10000000000L) == ref10(x), s"compute($x, 1e10)")
    }
    // and on the fixture columns q18 converts at scale 10: bit-equal to
    // the decimal(38,10) cast (raw ≤4-decimal values, never a boundary)
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.01")
    def castUnscaled10(x: org.apache.spark.sql.Column) =
      x.cast("decimal(38,10)").multiply(lit(10000000000L)).cast("long")
    val bad = li.filter(Seq(col("l_extendedprice"), col("l_quantity"), col("l_discount"))
        .map(x => ExactDecimal.scaled(x, 10) =!= castUnscaled10(x)).reduce(_ || _))
      .count()
    assert(bad == 0L, "scale-10 conversion must be bit-equal on raw money columns")
  }

  test("q03/q18/q23 split-long rewrites reproduce the decimal formulations exactly") {
    import graft.queries.Num.{decM, dec, sumM, avgM}
    val d = "/root/testdata/sf0.01"
    val li = graft.Tables.lineitem(spark, d)

    val q03Ref = li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        sumM(col("l_quantity"), 2).as("sum_qty"),
        sumM(col("l_extendedprice"), 2).as("sum_base_price"),
        sumM(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("sum_disc_price"),
        avgM(col("l_quantity"), 4).as("avg_qty"),
        avgM(col("l_extendedprice"), 4).as("avg_price"),
        avgM(col("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus").collect().toSeq
    val q03Now = graft.queries.Relational.q03PricingSummary(spark, d)
      .select(q03Ref.head.schema.fieldNames.map(col).toIndexedSeq: _*).collect().toSeq
    assert(q03Now == q03Ref, "q03 values must be bit-identical")

    val q18Ref = li.groupBy("l_returnflag")
      .agg(
        round(try_divide(
          sum(dec(col("l_extendedprice"))).cast("double"),
          nullif(sum(dec(col("l_quantity"))).cast("double"), lit(0.0))), 4)
          .as("price_per_qty"),
        try_divide(sum("l_quantity"), lit(0)).as("div_by_zero"))
      .orderBy("l_returnflag").collect().toSeq
    val q18Now = graft.queries.Relational.q18SafeDivide(spark, d).collect().toSeq
    assert(q18Now == q18Ref, "q18 values must be bit-identical")

    val p = graft.Tables.part(spark, d).select("p_partkey", "p_brand")
    val sup = graft.Tables.supplier(spark, d).select("s_suppkey", "s_name")
    val q23Ref = li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy("p_brand", "s_name")
      .agg(
        count(lit(1)).as("n_lines"),
        sumM(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("net_revenue"),
        avgM(col("l_quantity"), 4).as("avg_qty"))
      .orderBy("p_brand", "s_name").collect().toSeq
    val q23Now = graft.queries.Relational.q23EnrichedAgg(spark, d).collect().toSeq
    assert(q23Now == q23Ref, "q23 values must be bit-identical")

    val q06Ref = li.join(graft.Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        countDistinct(col("o_orderkey")).as("n_orders"),
        count(lit(1)).as("n_lines"),
        sumM(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("revenue"),
        avgM(col("l_quantity"), 4).as("avg_qty"))
      .orderBy("o_orderpriority").collect().toSeq
    val q06Now = graft.queries.Relational.q06PrioritySummary(spark, d).collect().toSeq
    assert(q06Now == q06Ref, "q06 values must be bit-identical")
  }

  test("compute overflows loudly past decimal(18,6); expression nulls NaN/Inf like the cast") {
    intercept[ArithmeticException](ExactDecimal.compute(1e13))
    intercept[ArithmeticException](ExactDecimal.compute(-1e13))
    intercept[ArithmeticException](ExactDecimal.compute(1.44e14))
    intercept[ArithmeticException](ExactDecimal.compute(9.3e18)) // e >= 0 branch
    val out = Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity, 2.5)
      .toDF("x").select(ExactDecimal.scaled6(col("x"))).collect()
    assert(out.take(3).forall(_.isNullAt(0)), "NaN/Inf must be null (cast parity)")
    assert(out(3).getLong(0) == 2500000L)
  }

  test("vs the decimal cast on fixture values: bit-equal on money columns, ≤1 unit on products") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.01")
    val q = col("l_quantity"); val dc = col("l_discount"); val p = col("l_extendedprice")
    def castUnscaled(x: org.apache.spark.sql.Column) =
      graft.queries.Num.decM(x).cast("decimal(38,6)").multiply(lit(1000000L)).cast("long")
    // raw money-grade columns: exact-binary and shortest-repr rounding agree
    val rawBad = li.filter(Seq(q, dc, p)
        .map(x => ExactDecimal.scaled6(x) =!= castUnscaled(x)).reduce(_ || _))
      .count()
    assert(rawBad == 0L, "money columns must round identically under both semantics")
    // double-rounded products: the two semantics may differ, but never by
    // more than one unscaled unit (see ExactDecimal scaladoc)
    val prodBad = li.filter(Seq(q * p, dc * p, q * q, dc * dc, p * p)
        .map(x => abs(ExactDecimal.scaled6(x) - castUnscaled(x)) > 1).reduce(_ || _))
      .count()
    assert(prodBad == 0L, "product rounding may differ by at most 1e-6")
  }

  test("splitProductSums: exact long product == decimal cast of the double product, per row") {
    Seq("sf0.001", "sf0.01").foreach { sf =>
      val li = graft.Tables.lineitem(spark, s"/root/testdata/$sf")
      // the helper's input contract: both factors are raw ≤2-decimal money
      val contractBad = li.filter(Seq(col("l_extendedprice"), col("l_discount"))
          .map(x => ExactDecimal.scaled(x, 2) =!= x.cast("decimal(38,2)")
            .multiply(lit(100L)).cast("long")).reduce(_ || _))
        .count()
      assert(contractBad == 0L, s"$sf: inputs must be exactly 2-decimal")
      // per-row: P·(100−D) at scale 4 == unscaled CAST(p*(1-d) AS DECIMAL(·,4))
      // of the double product — the identity that makes the sum substitution
      // bit-safe (no boundary cases, unlike generic products)
      val prodU = ExactDecimal.scaled(col("l_extendedprice"), 2) *
        (lit(100L) - ExactDecimal.scaled(col("l_discount"), 2))
      val castU = (col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(38,4)").multiply(lit(10000L)).cast("long")
      val bad = li.filter(prodU =!= castU).count()
      assert(bad == 0L, s"$sf: product substitution must be bit-equal on every row")
    }
  }

  test("q10's split-long formulation reproduces the decimal-sum formulation exactly") {
    import graft.queries.Num.decM
    def corrOf(n: org.apache.spark.sql.Column, sx: org.apache.spark.sql.Column,
        sy: org.apache.spark.sql.Column, sxy: org.apache.spark.sql.Column,
        sx2: org.apache.spark.sql.Column, sy2: org.apache.spark.sql.Column) =
      round((n * sxy - sx * sy) / (sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy)), 6)
    val q = col("l_quantity"); val dc = col("l_discount"); val p = col("l_extendedprice")
    // the retired round-3 implementation, inlined as the reference
    val reference = graft.Tables.lineitem(spark, "/root/testdata/sf0.01")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(decM(q)).cast("double").as("sq"), sum(decM(dc)).cast("double").as("sd"),
        sum(decM(p)).cast("double").as("sp"), sum(decM(q * p)).cast("double").as("sqp"),
        sum(decM(dc * p)).cast("double").as("sdp"), sum(decM(q * q)).cast("double").as("sq2"),
        sum(decM(dc * dc)).cast("double").as("sd2"), sum(decM(p * p)).cast("double").as("sp2"))
      .select(col("l_returnflag"),
        corrOf(col("n"), col("sq"), col("sp"), col("sqp"), col("sq2"), col("sp2")).as("corr_qty_price"),
        corrOf(col("n"), col("sd"), col("sp"), col("sdp"), col("sd2"), col("sp2")).as("corr_disc_price"))
      .orderBy("l_returnflag")
      .as[(String, Double, Double)].collect().toSeq
    val current = graft.queries.Relational.q10Corr(spark, "/root/testdata/sf0.01")
      .as[(String, Double, Double)].collect().toSeq
    assert(current == reference, "split-long moments must be bit-identical")
  }
}
