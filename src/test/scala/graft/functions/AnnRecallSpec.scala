package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Recall evidence for the approximate similarity-search paths against
  * the exact brute-force baseline, on the real embeddings fixture.
  */
class AnnRecallSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.01"
  private def emb: DataFrame = Tables.embeddings(spark, d)

  private def bruteTopK(queryId: Long, k: Int): Seq[Long] = {
    val q = emb.filter(col("vec_id") === queryId).select(col("embedding").as("q_emb"))
    emb.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        VectorExpressions.cosine(col("embedding"), col("q_emb")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
      .collect().map(_.getLong(0)).toSeq
  }

  test("hyperplane LSH buckets are deterministic and balanced-ish") {
    val ps = VectorLsh.planes(8, 64)
    val buckets = emb.select(VectorLsh.bucket(col("embedding"), ps).as("b"))
    val n = buckets.distinct().count()
    assert(n > 10, s"only $n distinct buckets for 8 planes — hashing is degenerate")
    val again = emb.select(VectorLsh.bucket(col("embedding"), ps).as("b"))
      .groupBy("b").count().orderBy("b").collect()
    val first = buckets.groupBy("b").count().orderBy("b").collect()
    assert(again.map(_.toString).toSeq == first.map(_.toString).toSeq)
  }

  test("multi-table LSH ANN reaches useful recall at a sub-full probe fraction") {
    // This fixture's corpus is nearly unstructured (best neighbor cosine
    // ~0.37 -> per-plane collision p ~= 0.62), the hardest case for LSH:
    // single-table recall is near zero, multi-table recovers it at the
    // cost of probe fraction — the recall/cost dial the structure exists
    // to expose. Clustered real-world embeddings sit far to the better
    // side of this tradeoff.
    val queries = Seq(0L, 7L, 42L)
    val recalls = queries.map { qid =>
      val exact = bruteTopK(qid, 10).toSet
      val q = emb.filter(col("vec_id") === qid).select("embedding")
      val approx = VectorLsh.annTopKMulti(
        emb.filter(col("vec_id") =!= qid), q, "embedding", "vec_id",
        tables = 6, planesPerTable = 3, dim = 64, k = 10)
        .collect().map(_.getLong(0)).toSet
      exact.intersect(approx).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall@10 $mean (per-query: $recalls)")
  }

  test("multi-probe LSH: probe set is base + distinct lowest-margin flips; recall is monotone") {
    val ps = VectorLsh.planes(8, 64)
    Seq(0L, 7L, 42L).foreach { qid =>
      val q = emb.filter(col("vec_id") === qid).select("embedding")
      val corpus = emb.filter(col("vec_id") =!= qid)
      val qBucket = q.select(VectorLsh.bucket(col("embedding"), ps).as("b"))
        .head().getLong(0)
      val qProbes = q.select(VectorLsh.probeBuckets(col("embedding"), ps, 4).as("p"))
        .head().getSeq[Long](0)
      assert(qProbes.head == qBucket && qProbes.distinct.length == 5,
        s"probe set must start at the base bucket with distinct flips: $qProbes")
      assert(qProbes.tail.forall(p => java.lang.Long.bitCount(p ^ qBucket) == 1),
        s"each probe must be a single-bit flip of the base: $qProbes")
      // candidate containment ⇒ recall monotone vs single-bucket
      val exact = bruteTopK(qid, 10).toSet
      val single = VectorLsh.annTopK(corpus, q, "embedding", "vec_id",
        nPlanes = 8, dim = 64, k = 10).collect().map(_.getLong(0)).toSet
      val probed = VectorLsh.annTopKMultiProbe(corpus, q, "embedding", "vec_id",
        nPlanes = 8, dim = 64, k = 10, nProbes = 4).collect().map(_.getLong(0)).toSet
      assert(exact.intersect(probed).size >= exact.intersect(single).size)
    }
  }

  test("multi-probe finds the near-dup the base bucket misses (lowest-margin flip)") {
    // Reflect the query across its LOWEST-|margin| hyperplane: the planted
    // vector keeps cosine ≈ 1 but flips exactly that plane's sign, so it
    // lands one bit away — invisible to the single-bucket probe, captured
    // by the first multi-probe flip. This is the precise failure mode
    // multi-probe exists to fix.
    val ps = VectorLsh.planes(8, 64)
    val v = emb.filter(col("vec_id") === 7L)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble)
    val dots = ps.map(p => p.zip(v).map { case (a, b) => a * b }.sum)
    val iMin = dots.map(math.abs).zipWithIndex.min._2
    val pMin = ps(iMin)
    val scale = 2.0 * dots(iMin) / pMin.map(x => x * x).sum
    val planted = v.zip(pMin).map { case (x, w) => (x - scale * w).toFloat }

    import spark.implicits._
    val plantedDf = Seq((99999L, planted)).toDF("vec_id", "embedding")
    val corpus = emb.select(col("vec_id"), col("embedding")).unionByName(plantedDf)
      .filter(col("vec_id") =!= 7L)
    val q = emb.filter(col("vec_id") === 7L).select("embedding")

    // sanity: the reflection flipped exactly the intended bit
    val qb = q.select(VectorLsh.bucket(col("embedding"), ps).as("b")).head().getLong(0)
    val pb = plantedDf.select(VectorLsh.bucket(col("embedding"), ps).as("b")).head().getLong(0)
    assert(pb == (qb ^ (1L << iMin)),
      f"reflection must flip bit $iMin: q=$qb%x planted=$pb%x")

    val single = VectorLsh.annTopK(corpus, q, "embedding", "vec_id",
      nPlanes = 8, dim = 64, k = 3).collect().map(_.getLong(0)).toSet
    assert(!single.contains(99999L), "base bucket must miss the one-bit-away near-dup")
    val probed = VectorLsh.annTopKMultiProbe(corpus, q, "embedding", "vec_id",
      nPlanes = 8, dim = 64, k = 3, nProbes = 1).collect()
    assert(probed.head.getLong(0) == 99999L,
      s"first flip must surface the near-dup: ${probed.toSeq}")
    assert(probed.head.getDouble(1) > 0.99, "reflection across a low-margin plane keeps cosine ≈ 1")
  }

  test("single-table LSH finds a planted duplicate (scale-invariant bucket signs)") {
    // scaling a vector preserves both its hyperplane signs and cosine=1,
    // so a planted duplicate must share the query's bucket in one table
    // and surface at the top of the re-rank
    val planted = emb.filter(col("vec_id") === 7L)
      .select(lit(99999L).as("vec_id"),
        transform(col("embedding"), x => x * 0.5f).as("embedding"))
    val corpus = emb.select(col("vec_id"), col("embedding")).unionByName(planted)
    val q = emb.filter(col("vec_id") === 7L).select("embedding")
    val top = VectorLsh.annTopK(
      corpus.filter(col("vec_id") =!= 7L), q, "embedding", "vec_id",
      nPlanes = 8, dim = 64, k = 3).collect()
    assert(top.head.getLong(0) == 99999L, s"planted dup not found: ${top.toSeq}")
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-9)
  }

  test("IVF (label cells) restricts candidates; within-cell results are exact") {
    val q = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").as("q_emb"), col("label").as("q_label"))
    val cell = emb.filter(col("vec_id") =!= 0L)
      .join(broadcast(q), col("label") === col("q_label"))
    val total = emb.filter(col("vec_id") =!= 0L).count()
    val probed = cell.count()
    assert(probed < total / 5, s"IVF must probe a fraction of the corpus ($probed / $total)")
    // the IVF top-k is exactly the brute-force top-k restricted to the cell
    val ivf = cell.select(col("vec_id"),
      VectorExpressions.cosine(col("embedding"), col("q_emb")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(5)
      .collect().map(_.getLong(0)).toSeq
    val labelOf0 = emb.filter(col("vec_id") === 0L).select("label").head().getInt(0)
    val bruteInCell = {
      val qv = emb.filter(col("vec_id") === 0L).select(col("embedding").as("q_emb"))
      emb.filter(col("vec_id") =!= 0L && col("label") === labelOf0)
        .crossJoin(broadcast(qv))
        .select(col("vec_id"),
          VectorExpressions.cosine(col("embedding"), col("q_emb")).as("sim"))
        .orderBy(col("sim").desc, col("vec_id")).limit(5)
        .collect().map(_.getLong(0)).toSeq
    }
    assert(ivf == bruteInCell)
  }
}
