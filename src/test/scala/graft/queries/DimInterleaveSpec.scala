package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** Independent-recomputation coverage for q126 (embedding dimension
  * audit) and q127 (deterministic curriculum interleave): both are
  * replayed in plain Scala from the raw fixture and compared exactly.
  */
class DimInterleaveSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("q126 matches a Scala replay of the quantized per-dimension stats") {
    val vecs = Tables.embeddings(spark, d)
      .select("embedding").as[Seq[Float]].collect().toSeq
    // round half AWAY FROM ZERO, as Spark's round()/DuckDB's round() do
    // (math.round would round half toward +inf and drift on negatives)
    val quant = (x: Float) =>
      BigDecimal(x.toDouble * 1048576L)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val dims = vecs.head.size
    val expected = (1 to dims).map { pos =>
      val qs = vecs.map(v => quant(v(pos - 1)))
      (pos.toLong, qs.size.toLong, qs.sum, qs.min, qs.max,
        qs.count(_ == 0L).toLong, qs.min == qs.max)
    }
    val got = LlmOps.q126DimAudit(spark, d)
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(got == expected)
  }

  test("q127 prefix equals a Scala replay and is partition-layout-invariant") {
    val docs = Tables.documents(spark, d)
      .select("source", "doc_id").as[(String, Long)].collect().toSeq
    val ranked = docs.groupBy(_._1).toSeq.flatMap { case (src, ds) =>
      ds.map(_._2).sorted.zipWithIndex.map { case (id, i) => (src, id, i + 1L) }
    }
    val expected = ranked.sortBy(r => (r._3, r._1)).take(Corpus.InterleaveK)
      .zipWithIndex.map { case ((src, id, rn), i) => (i + 1L, src, id, rn) }
    val got = Corpus.q127Interleave(spark, d)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == expected)
    // layout invariance: the same order from a repartitioned source view
    val reshuffled = Tables.documents(spark, d).repartition(7, col("doc_id"))
    val wSrc = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
    val again = reshuffled.select(col("source"), col("doc_id"))
      .withColumn("rn", row_number().over(wSrc).cast("long"))
      .orderBy(col("rn"), col("source")).limit(Corpus.InterleaveK)
      .select("source", "doc_id", "rn")
      .as[(String, Long, Long)].collect().toSeq
    assert(again == expected.map(r => (r._2, r._3, r._4)))
  }
}
