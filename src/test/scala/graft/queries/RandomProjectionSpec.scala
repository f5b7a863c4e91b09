package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables
import graft.functions.PolyHash

class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private def sign(i: Long, j: Long): Long = {
    val a = PolyHash.coefA(50); val b = PolyHash.coefB(50)
    1L - 2L * (Math.floorMod(a * i + b * j + 12345L, PolyHash.Mod) % 2L)
  }

  test("sketches recompute exactly from an independent quantize + sign replay") {
    val out = LlmOps.q94RandomProjection(spark, d)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val vecs = Tables.embeddings(spark, d)
      .filter($"vec_id" <= 20)
      .select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect()
    assert(vecs.nonEmpty && out.size == vecs.length * 16)
    vecs.foreach { case (id, emb) =>
      val mn = emb.min.toDouble; val mx = emb.max.toDouble
      val codes = emb.map { x =>
        if (mx == mn) 0L
        else BigDecimal((x.toDouble - mn) / ((mx - mn) / 255.0))
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }
      (0 until 16).foreach { j =>
        val y = codes.zipWithIndex.map { case (c, i) => c * sign(i, j) }.sum
        assert(out((id, j.toLong)) == y, s"vec $id dim $j")
      }
    }
  }

  test("the sign family is balanced enough to act as a JL sketch") {
    val signs = for (i <- 0L until 64L; j <- 0L until 16L) yield sign(i, j)
    assert(signs.forall(s => s == 1L || s == -1L))
    val plus = signs.count(_ == 1L)
    // a degenerate (checkerboard or constant) family would sit at exactly
    // half or all; require a sane band around balance
    assert(plus > signs.length / 3 && plus < 2 * signs.length / 3,
      s"sign family badly unbalanced: $plus of ${signs.length}")
    // and the columns must not all be identical
    val cols = (0L until 16L).map(j => (0L until 64L).map(i => sign(i, j)))
    assert(cols.distinct.length > 8, "projection columns must differ")
  }
}
