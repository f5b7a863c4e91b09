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
