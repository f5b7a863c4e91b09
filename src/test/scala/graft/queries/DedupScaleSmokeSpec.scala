package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables
import graft.functions.MinHash
import graft.ops.ConnectedComponents

/** Empirical 100 TB-posture smoke for the dedup chain (round-6 verdict
  * task 6): run signature → bands → bucket guard → pairs → connected
  * components end-to-end on a corpus ~10× the fixture (self-union with
  * doc_id offsets — every original becomes a 10-member exact-duplicate
  * clique on top of the planted near-dup structure) and assert the two
  * properties the scaladoc claims survive growth:
  *
  *  1. the degenerate-bucket guard stays quiet — 10× more docs must not
  *     push any (band, bucket) over the pairwise-join bound, because
  *     bucket size grows with CLUSTER size (×10 here), not corpus size;
  *  2. label propagation still converges in a small constant number of
  *     rounds — duplicate clusters are near-cliques, so their diameter
  *     (hence the round count) does not grow with replication.
  *
  * The fixture is built in-memory from the driver's parquet (never
  * synthesized content — only ids are offset), so the test scales with
  * the checked-in data.
  */
class DedupScaleSmokeSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private val Copies = 10
  private val Offset = 1000000L
  private val MaxBucket = 1000

  private lazy val corpus10x = {
    val en = Tables.documents(spark, d)
      .filter(col("lang") === "en")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("tokens"))
    (0 until Copies).map { c =>
      en.select((col("doc_id") + lit(c * Offset)).as("doc_id"), col("tokens"))
    }.reduce(_ unionByName _)
  }

  test("10x corpus: bucket guard drops nothing; every replica co-clusters; rounds stay constant") {
    // maxBucket is 10x the per-query setting (100) because every bucket
    // legitimately grew 10x with its cluster — the guard bound scales
    // with the worst acceptable CLUSTER, not with the corpus.
    val oversized = MinHash.oversizedBuckets(corpus10x, "doc_id", "tokens",
      shingleN = 2, k = 64, nBands = 8, maxBucket = MaxBucket, portable = true)
    assert(oversized.isEmpty,
      "no (band, bucket) may exceed the pairwise bound on the replicated corpus")

    val pairs = MinHash.candidatePairs(corpus10x, "doc_id", "tokens",
      shingleN = 2, k = 64, nBands = 8,
      minJaccard = 0.5, maxBucket = MaxBucket, portable = true)
    val (clusters, rounds) = ConnectedComponents.assignCounted(pairs, "id_a", "id_b")
    val byCluster = clusters.select(col("node"), col("cluster_id"))
      .as[(Long, Long)].collect().groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap

    // every original doc's 10 id-offset replicas share identical tokens →
    // identical signatures → same buckets → one clique → ONE cluster
    val assigned = byCluster.values.flatten.toSet
    val replicated = assigned.map(_ % Offset)
    replicated.foreach { base =>
      val family = (0 until Copies).map(c => base + c * Offset).toSet
      assert(family.subsetOf(assigned), s"all replicas of $base must appear in the graph")
      val owners = byCluster.filter(_._2.exists(family.contains)).keySet
      assert(owners.size == 1, s"replica family of $base split across clusters $owners")
    }

    // convergence must not degrade with replication: cliques keep the
    // diameter — and therefore the round count — a small constant
    assert(rounds <= 4, s"CC took $rounds rounds on the 10x corpus")
  }
}
