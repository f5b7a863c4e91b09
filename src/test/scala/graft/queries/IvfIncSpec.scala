package graft.queries

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** q238's incremental-IVF contract: a replayed delta append is
  * idempotent (rewrites its own batch partitions, never duplicates),
  * the union of batch generations covers every vector exactly once,
  * the probe reads the generations under partition pruning, and the
  * q106-style recall audit holds over the INCREMENTALLY built index
  * (the delta vectors remain findable after landing in argmax cells).
  */
class IvfIncSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def buildAt(dir: String): Unit = {
    val e = Tables.embeddings(spark, sf)
    LlmOps.ivfBuildBase(spark, e.filter(pmod(col("vec_id"), lit(5)) =!= 0), dir)
    LlmOps.ivfAppendDelta(spark, e.filter(pmod(col("vec_id"), lit(5)) === 0),
      dir, 1L)
  }

  test("a replayed delta append is idempotent: identical probe output, no duplicates") {
    val dir = java.nio.file.Files.createTempDirectory("ivfinc_replay_").toString
    buildAt(dir)
    val once = LlmOps.ivfProbe(spark, sf, dir).collect().toSeq
    // the crash-and-replay: the same batch lands again
    LlmOps.ivfAppendDelta(spark,
      Tables.embeddings(spark, sf).filter(pmod(col("vec_id"), lit(5)) === 0),
      dir, 1L)
    val twice = LlmOps.ivfProbe(spark, sf, dir).collect().toSeq
    assert(once == twice, "replaying an append must not change the probe")
    val lists = spark.read.parquet(s"$dir/lists")
    assert(lists.groupBy("vec_id").count().filter(col("count") > 1).isEmpty,
      "no vector may appear twice across generations after a replay")
  }

  test("generations partition the corpus: every vector in exactly one cell") {
    val dir = java.nio.file.Files.createTempDirectory("ivfinc_cover_").toString
    buildAt(dir)
    val lists = spark.read.parquet(s"$dir/lists")
    val n = Tables.embeddings(spark, sf).count()
    assert(lists.count() == n, "lists must cover the whole corpus")
    assert(lists.select("vec_id").distinct().count() == n)
    // the delta generation holds exactly the delta vectors
    val deltaIds = lists.filter(col("batch_id") === 1)
      .select("vec_id").as[Long].collect().toSet
    assert(deltaIds.nonEmpty && deltaIds.forall(_ % 5 == 0))
  }

  test("generation compaction is probe-invariant and collapses to one generation") {
    val dir = java.nio.file.Files.createTempDirectory("ivfinc_compact_").toString
    // base + TWO disjoint delta generations, so compaction folds three
    val e = Tables.embeddings(spark, sf)
    LlmOps.ivfBuildBase(spark, e.filter(pmod(col("vec_id"), lit(5)) =!= 0), dir)
    LlmOps.ivfAppendDelta(spark,
      e.filter(pmod(col("vec_id"), lit(10)) === 0), dir, 1L)
    LlmOps.ivfAppendDelta(spark,
      e.filter(pmod(col("vec_id"), lit(10)) === 5), dir, 2L)
    val before = LlmOps.ivfProbe(spark, sf, dir).collect().toSeq
    LlmOps.ivfCompactGenerations(spark, dir)
    val after = LlmOps.ivfProbe(spark, sf, dir).collect().toSeq
    assert(before == after, "compaction must be bit-invariant to the probe")
    val gens = spark.read.parquet(s"$dir/lists")
      .select("batch_id").distinct().as[Long].collect().toSeq
    assert(gens == Seq(0L), s"one generation after compaction: $gens")
  }

  test("the probe prunes the generation read to the probed cells") {
    val df = LlmOps.q238IvfIncremental(spark, sf)
    val scans = df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec if f.relation.location.rootPaths
        .exists(_.toString.contains("ivfinc_")) &&
        f.relation.location.rootPaths.exists(_.toString.contains("lists")) => f
    }
    assert(scans.nonEmpty, "the probe must read the published lists layout")
    assert(scans.exists(_.partitionFilters.exists(
        _.toString.contains("dynamicpruning"))),
      s"lists scan should be DPP-pruned: ${scans.map(_.partitionFilters)}")
  }

  test("recall audit: the incremental index matches the build-once index (q106 arithmetic)") {
    // exact top-K by cosine vs each probe's top-K, per query point —
    // freezing centroids at the base build and argmax-assigning the
    // delta must not degrade recall vs q205's build-once layout (same
    // nprobe/topK; the two differ only in maintenance protocol)
    val k = 5
    def probeSets(rows: Array[org.apache.spark.sql.Row]) = rows
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val inc = probeSets(LlmOps.q238IvfIncremental(spark, sf).collect())
    val once = probeSets(LlmOps.q205IvfIndex(spark, sf).collect())
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect()
    val queries = e.filter(v => v._1 % 50 == 0 && v._1 < 50000)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def meanOverlap(probe: Map[Long, Set[Long]]): Double = {
      val overlaps = queries.map { case (qid, qe) =>
        val exact = e.filter(_._1 != qid)
          .map { case (v, emb) => (v, cos(emb, qe)) }
          .sortBy { case (v, s) => (-s, v) }.take(k).map(_._1).toSet
        (exact intersect probe.getOrElse(qid, Set.empty)).size
      }
      overlaps.sum.toDouble / overlaps.length
    }
    val (mInc, mOnce) = (meanOverlap(inc), meanOverlap(once))
    assert(mInc >= mOnce - 0.5,
      s"incremental recall@$k ($mInc) degraded vs build-once ($mOnce)")
    assert(mInc > 1.0,
      s"incremental recall@$k implausibly low: $mInc — probe broken?")
  }
}
