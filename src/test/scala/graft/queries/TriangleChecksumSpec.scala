package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.PolyHash

/** q139 kNN-graph triangles and q140 table checksum: brute-force Scala
  * replays (full pairwise cosine + edge-set triangle scan; row-hash
  * accumulation) pin the graph construction, the ordered-adjacency
  * census, and the checksum's merge/corruption laws.
  */
class TriangleChecksumSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q139 census equals a brute-force pairwise + edge-scan replay") {
    val vecs = graft.Tables.embeddings(spark, d)
      .select($"label".cast("long"), $"vec_id", $"embedding")
      .as[(Long, Long, Array[Float])].collect()
    def cosRaw(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def cos(a: Array[Float], b: Array[Float]): Double = round4(cosRaw(a, b))
    // the corpus-proportional cell assignment: argmax 2^40-quantized
    // cosine over the stride-256 seeds, ties to the LARGER cell_id (the
    // engine's max_by on the (qsim, cell_id) struct)
    val seeds = vecs.filter(_._2 % 256L == 0L).map(v => v._2 -> v._3)
    assert(seeds.length > 1, "fixture must seed multiple cells")
    def cellOf(e: Array[Float]): Long =
      seeds.maxBy { case (cid, ce) => (qGrid(cosRaw(e, ce)), cid) }._1
    val expected = vecs
      .map(v => (v._1, cellOf(v._3), v._2, v._3))
      .groupBy(v => (v._1, v._2)).toSeq
      .filter(_._2.length <= 10000)
      .flatMap { case ((lb, _), vs) =>
        val ids = vs.map(_._3).toSeq
        val emb = vs.map(v => v._3 -> v._4).toMap
        ids.flatMap { ia =>
          ids.filter(_ != ia)
            .map(ib => (ib, cos(emb(ia), emb(ib))))
            .sortBy { case (ib, sim) => (-sim, ib) }
            .take(5)
            .map { case (ib, _) =>
              (lb, math.min(ia, ib), math.max(ia, ib)) }
        }
      }.distinct
      .groupBy(_._1).toSeq.sortBy(_._1).map { case (lb, es) =>
        val edges = es.map(e => (e._2, e._3)).toSet
        val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).map { case (_, v) => v.size.toLong }
        val wedges = deg.map(dg => dg * (dg - 1) / 2).sum
        val tris = (for {
          (a, b) <- edges; (a2, c) <- edges
          if a2 == a && b < c && edges.contains((b, c))
        } yield (a, b, c)).size.toLong
        (lb, deg.size.toLong, edges.size.toLong, wedges, tris,
          if (wedges > 0) Some(tris * 3 * 1000000L / wedges) else None)
      }
    val got = LlmOps.q139KnnTriangles(spark, d)
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect().toSeq
    assert(got == expected)
    assert(got.forall(_._6.forall(_ <= 1000000L)),
      "transitivity can never exceed 1e6 ppm")
    assert(got.exists(_._5 > 0), "the semantic graph should close triangles")
  }

  test("q140 checksum equals a row-hash replay, merges, and detects " +
    "single-char corruption") {
    val rows = graft.sources.Layouts.documents(spark, d)
      .select($"source", $"doc_id", $"lang", $"text")
      .as[(String, Long, String, String)].collect()
    def rowH(r: (String, Long, String, String)): Long =
      PolyHash.horner(s"${r._2}|${r._3}|${r._4}")
    def fold(rs: Seq[Long]): (Long, Long, Long, Long, Long) =
      (rs.size.toLong,
        (rs.map(BigInt(_)).sum % PolyHash.Mod).toLong,
        rs.reduce(_ ^ _), rs.min, rs.max)
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, rs) =>
      val f = fold(rs.map(rowH).toSeq)
      (src, f._1, f._2, f._3, f._4, f._5)
    }
    val got = Corpus.q140TableChecksum(spark, d)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // merge law: shard fingerprints combine into the table fingerprint
    val hs = rows.filter(_._1 == rows.head._1).map(rowH).toSeq
    val (l, r) = hs.splitAt(hs.size / 2)
    val (fl, fr, whole) = (fold(l), fold(r), fold(hs))
    assert((fl._1 + fr._1, (fl._2 + fr._2) % PolyHash.Mod, fl._3 ^ fr._3,
      math.min(fl._4, fr._4), math.max(fl._5, fr._5)) ==
      (whole._1, whole._2, whole._3, whole._4, whole._5))
    // corruption: one flipped char in one row changes the fingerprint
    val corrupted = hs.updated(0,
      PolyHash.horner(s"${rows.head._2}|${rows.head._3}|${rows.head._4}X"))
    assert(fold(corrupted) != whole)
  }
}
