package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Random-hyperplane LSH for embedding vectors — the bucketed scale path
  * for cosine similarity search (SURVEY §7.5: brute-force as baseline,
  * LSH/IVF as the 100 TB path).
  *
  * `nPlanes` fixed hyperplanes are generated from a seeded PRNG at plan
  * build time and inlined as array literals, so the bucketing is
  * deterministic and needs no fitted model or stored state. A vector's
  * bucket is the sign pattern of its projections: cos-similar vectors
  * agree on most signs, so near neighbors collide with probability
  * (1 - θ/π)^nPlanes. Search = hash the query, scan ONLY its bucket
  * (at scale: the table is written partitioned/bucketed BY this key, so
  * the probe is partition-pruned I/O, not a full scan), then exact
  * cosine re-rank inside the bucket. Recall tuning: [[annTopKMultiProbe]]
  * (flip the lowest-margin bits — query-side fan-out, corpus hashed once)
  * or [[annTopKMulti]] (independent tables).
  */
object VectorLsh {

  /** Deterministic hyperplanes: unit-free gaussian-ish components from a
    * fixed-seed PRNG (Box-Muller over a seeded stream). Literal arrays —
    * the plan embeds them; every run and every engine sees identical
    * planes.
    */
  def planes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Dot product of an array<float/double> column with a literal plane. */
  private def dotLit(v: Column, plane: Seq[Double]): Column =
    aggregate(
      zip_with(v, lit(plane.toArray), (x, w) => x.cast("double") * w),
      lit(0.0), (acc, x) => acc + x)

  /** The LSH bucket key: one bit per hyperplane (sign of projection). */
  def bucket(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.foldLeft(lit(0L)) { case (acc, (p, i)) =>
      acc.bitwiseOR(when(dotLit(v, p) >= 0, lit(1L << i)).otherwise(lit(0L)))
    }

  /** Bucketed approximate top-k: hash query + corpus with the same
    * planes, keep only the query's bucket, exact-cosine re-rank inside
    * it. Returns (vec_id, sim) ordered desc. Single-table — use
    * [[annTopKMulti]] when the corpus has weak similarity structure.
    */
  def annTopK(corpus: DataFrame, queryVec: DataFrame, vecCol: String, idCol: String,
              nPlanes: Int, dim: Int, k: Int): DataFrame = {
    val ps = planes(nPlanes, dim)
    val q = queryVec.select(col(vecCol).as("q_emb"), bucket(col(vecCol), ps).as("q_bucket"))
    corpus
      .withColumn("bucket", bucket(col(vecCol), ps))
      .join(broadcast(q), col("bucket") === col("q_bucket"))
      .select(col(idCol),
        VectorExpressions.cosine(col(vecCol), col("q_emb")).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Query-side probe set for MULTI-PROBE LSH: the base bucket plus one
    * single-bit flip for each of the `nProbes` LOWEST-|projection| planes.
    * A near neighbor that disagrees with the query on one plane almost
    * always disagrees where the query's projection is smallest (the
    * hyperplane passes closest), so probing those flips recovers most of
    * the recall of extra tables WITHOUT another corpus hashing — the
    * query fans out, the corpus stays hashed once. All probe keys are
    * distinct (distinct single-bit flips), so a corpus vector matches at
    * most one probe and no candidate dedup is needed.
    */
  def probeBuckets(v: Column, ps: Seq[Seq[Double]], nProbes: Int): Column = {
    require(nProbes >= 0 && nProbes <= ps.length,
      s"nProbes $nProbes outside [0, ${ps.length}]")
    val base = bucket(v, ps)
    // (|projection|, planeIdx) sorted ascending — struct ordering is
    // field-by-field, so the first nProbes entries are the lowest margins
    val margins = array_sort(array(ps.zipWithIndex.map { case (p, i) =>
      struct(abs(dotLit(v, p)).as("m"), lit(i).as("i"))
    }: _*))
    val flips = transform(slice(margins, 1, nProbes),
      f => base.bitwiseXOR(
        pow(lit(2.0), f.getField("i").cast("double")).cast("long")))
    concat(array(base), flips)
  }

  /** Single-table multi-probe approximate top-k: corpus hashed ONCE,
    * query expanded to 1+nProbes bucket probes, exact cosine re-rank over
    * the union of probed buckets. At scale each probe is a partition-
    * pruned read of the bucket-partitioned layout — probe cost is
    * (1+nProbes)/2^nPlanes of the corpus, vs a whole extra table per unit
    * of recall for [[annTopKMulti]].
    */
  def annTopKMultiProbe(corpus: DataFrame, queryVec: DataFrame, vecCol: String,
                        idCol: String, nPlanes: Int, dim: Int, k: Int,
                        nProbes: Int): DataFrame = {
    val ps = planes(nPlanes, dim)
    val probes = queryVec
      .select(col(vecCol).as("q_emb"), probeBuckets(col(vecCol), ps, nProbes).as("probes"))
      .select(col("q_emb"), explode(col("probes")).as("q_bucket"))
    corpus
      .withColumn("bucket", bucket(col(vecCol), ps))
      .join(broadcast(probes), col("bucket") === col("q_bucket"))
      .select(col(idCol),
        VectorExpressions.cosine(col(vecCol), col("q_emb")).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Multi-table LSH (the classical recall fix): L independent tables of
    * `planesPerTable` bits; a vector is a candidate if it bucket-matches
    * the query in ANY table — recall 1-(1-p^k)^L vs p^k single-table.
    * At scale each table is a separate bucket-partitioned layout and the
    * probe unions L partition-pruned reads; here the OR-match is a
    * scan-side filter against the broadcast query row.
    */
  def annTopKMulti(corpus: DataFrame, queryVec: DataFrame, vecCol: String, idCol: String,
                   tables: Int, planesPerTable: Int, dim: Int, k: Int): DataFrame = {
    val allPlanes = (0 until tables).map(t => planes(planesPerTable, dim, seed = 42L + t))
    def buckets(v: Column): Column = array(allPlanes.map(p => bucket(v, p)): _*)
    val q = queryVec.select(col(vecCol).as("q_emb"), buckets(col(vecCol)).as("q_buckets"))
    corpus
      .withColumn("buckets", buckets(col(vecCol)))
      .crossJoin(broadcast(q))
      .filter(exists(zip_with(col("buckets"), col("q_buckets"), (a, b) => a === b),
        m => m))
      .select(col(idCol),
        VectorExpressions.cosine(col(vecCol), col("q_emb")).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }
}
