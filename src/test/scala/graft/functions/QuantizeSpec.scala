package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("quantize/dequantize round-trip error is bounded by half a step") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val err = e.select(
      col("embedding").as("orig"),
      Quantize.dequantize(Quantize.quantize(col("embedding"))).as("deq"))
      .select(aggregate(
        zip_with(col("orig"), col("deq"), (a, b) => abs(a.cast("double") - b)),
        lit(0.0), (acc, x) => greatest(acc, x)).as("max_err"),
        ((array_max(col("orig")) - array_min(col("orig"))).cast("double") / 255.0 / 2.0 + lit(1e-9))
          .as("half_step"))
    assert(err.filter(col("max_err") > col("half_step")).isEmpty,
      "every element must reconstruct within half a quantization step")
  }

  test("native roundTrip is bit-equal to dequantize∘quantize on the fixture") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val bad = e.select(
        Quantize.dequantize(Quantize.quantize(col("embedding"))).as("hof"),
        Quantize.roundTrip(col("embedding")).as("native"))
      .filter(col("hof") =!= col("native"))
      .count()
    assert(bad == 0L, "fused native round-trip must reproduce the HOF form exactly")
    // and on adversarial shapes: constant vector, negatives, null element
    val adv = Seq(
      (1L, Seq[java.lang.Float](0.5f, 0.5f, 0.5f)),
      (2L, Seq[java.lang.Float](-3.25f, 0.0f, 7.5f)),
      (3L, Seq[java.lang.Float](1.0f, null, 2.0f))).toDF("id", "v")
    val advBad = adv.select(
        Quantize.dequantize(Quantize.quantize(col("v"))).as("hof"),
        Quantize.roundTrip(col("v")).as("native"))
      .filter(col("hof") =!= col("native") ||
        col("hof").isNull =!= col("native").isNull)
      .count()
    assert(advBad == 0L)
  }

  test("NaN elements: order-independent all-NaN reconstruction, HOF-parity with ANSI off") {
    // NaN sorts greatest in Spark's array_min/array_max total order, so
    // any NaN poisons vmax → scale → every non-null output. The kernel
    // must agree regardless of WHERE the NaN sits (the old <,> sweep
    // special-cased NaN-first), and null slots must stay null.
    val vecs = Seq(
      (1L, Seq[java.lang.Float](Float.NaN, 1.0f, 2.0f)),
      (2L, Seq[java.lang.Float](1.0f, Float.NaN, 2.0f)),
      (3L, Seq[java.lang.Float](1.0f, null, Float.NaN))).toDF("id", "v")
    val native = vecs.select(col("id"), Quantize.roundTrip(col("v")).as("y"))
      .as[(Long, Seq[Option[Double]])].collect().toMap
    vecs.select(col("v")).as[Seq[Option[Float]]].collect().zip(Seq(1L, 2L, 3L)).foreach {
      case (in, id) =>
        native(id).zip(in).foreach {
          case (out, inEl) =>
            if (inEl.isEmpty) assert(out.isEmpty, s"null slot must stay null (id=$id)")
            else assert(out.exists(_.isNaN), s"non-null slot must be NaN (id=$id)")
        }
    }
    // With ANSI off, the HOF form computes the same all-NaN result
    // (cast(NaN as int) → 0, then vmin + 0·NaN = NaN) — bit parity holds.
    // With ANSI on (the session default) the HOF raises on that cast and
    // parity is deliberately out of contract (see roundTrip scaladoc).
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val bad = vecs.select(
          Quantize.dequantize(Quantize.quantize(col("v"))).as("hof"),
          Quantize.roundTrip(col("v")).as("native"))
        .select(to_json(col("hof")).as("h"), to_json(col("native")).as("n"))
        .filter(col("h") =!= col("n")).count()
      assert(bad == 0L, "NaN vectors must round-trip identically to the non-ANSI HOF form")
    } finally spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
  }

  test("constant vectors quantize to zero codes and reconstruct exactly") {
    val out = Seq(Seq(0.5f, 0.5f, 0.5f)).toDF("v")
      .select(Quantize.quantize(col("v")).as("q"))
      .select(col("q.codes"), Quantize.dequantize(col("q")).as("deq"))
      .as[(Seq[Int], Seq[Double])].head()
    assert(out._1 == Seq(0, 0, 0))
    assert(out._2 == Seq(0.5, 0.5, 0.5))
  }

  test("quantized cosine top-k closely tracks the exact top-k") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.01")
    def topk(emb: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Column): Seq[Long] = {
      val prepared = e.select(col("vec_id"), emb(e).as("v"))
      val q = prepared.filter(col("vec_id") === 0L).select(col("v").as("qv"))
      prepared.filter(col("vec_id") =!= 0L)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          VectorExpressions.cosine(col("v"), col("qv")).as("sim"))
        .orderBy(col("sim").desc, col("vec_id")).limit(10)
        .collect().map(_.getLong(0)).toSeq
    }
    val exact = topk(_ => col("embedding"))
    val quantized = topk(_ => Quantize.dequantize(Quantize.quantize(col("embedding"))))
    val overlap = exact.toSet.intersect(quantized.toSet).size
    assert(overlap >= 8, s"quantized recall@10 too low: $overlap/10 (exact=$exact quant=$quantized)")
  }
}
