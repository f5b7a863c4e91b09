package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Empirical growth smoke for the q77 semantic-dedup chain, mirroring
  * DedupScaleSmokeSpec's posture evidence for the lexical chain: run
  * assignment + within-cell pairwise on a corpus ~10× the fixture
  * (self-union with vec_id offsets — every original becomes a 10-member
  * identical family) and assert the properties the scaladoc claims
  * survive growth:
  *
  *  1. identical vectors assign identically — replica families never
  *     split across cells (assignment is content-deterministic);
  *  2. the keep-lowest rule holds under replication: every non-base
  *     replica has its family base (lower id, cosine 1) as a cell-mate,
  *     so at least 9/10 of every family is removed and survivors are a
  *     subset of the bases;
  *  3. the maxCell guard bound is not tripped by this growth (cells here
  *     grow with the corpus only because K is pinned to the same 8
  *     seeds; at real scale K grows with the corpus and the guard is the
  *     backstop, not the norm).
  */
class SemanticDedupScaleSmokeSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private val Copies = 10
  private val Offset = 1000000L

  test("10x embeddings: families co-assign; >=9/10 of each family removed; guard quiet") {
    val e0 = Tables.embeddings(spark, d).select("vec_id", "embedding")
    val e10 = (0 until Copies).map { c =>
      e0.select((col("vec_id") + lit(c * Offset)).as("vec_id"), col("embedding"))
    }.reduce(_ unionByName _)
    val cents = e0.filter(col("vec_id").between(1, 8))
      .select(col("vec_id").as("cell_id"), col("embedding").as("c_emb"))
    val nBases = e0.count()

    val audit = LlmOps.semanticDedupAudit(e10, cents, tau = 0.99, maxCell = 100000L)
      .as[(Long, Long, Long, Long, Double)].collect()
    val members = audit.map(_._2).sum
    val removed = audit.map(_._3).sum
    val kept = audit.map(_._4).sum
    assert(members == nBases * Copies,
      s"every replica must be assigned and audited: $members vs ${nBases * Copies}")
    assert(kept <= nBases,
      s"survivors must be a subset of the family bases: kept=$kept bases=$nBases")
    assert(removed >= nBases * (Copies - 1),
      s"at least 9/10 of every identical family must be removed: removed=$removed")
  }
}
