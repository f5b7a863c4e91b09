package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH banding over word shingles — the classical sub-quadratic
  * near-duplicate detector (SURVEY §7.5 dedup; shingle → minhash → band →
  * bucket-join). Signature and band computation are native Catalyst
  * expressions (one pass per row); the surrounding plan (explode, bucket
  * shuffle, self-join, estimator filter) is plain DataFrame ops.
  *
  * Hash family: one xxhash64 per shingle, then k multiply-shift
  * permutations inside the native MinHashSignature expression (see its
  * doc for why the all-builtin formulation was retired). The signature is
  * order-insensitive and deterministic; E[fraction of equal positions] =
  * Jaccard(shingles_a, shingles_b), so `estJaccard` is an unbiased
  * estimator with stderr ≈ sqrt(J(1-J)/k).
  *
  * 100 TB posture: `candidatePairs` never compares all pairs — docs are
  * exploded to (band, bucket) keys (one shuffle, 8-byte bucket ids) and
  * only same-bucket docs meet in the self-join. Bucket sizes are bounded
  * by `maxBucket` so a degenerate bucket (boilerplate spam cluster)
  * cannot quadratically explode a task — flagged rather than joined.
  */
object MinHash {

  /** Distinct word n-gram shingles from a token array; arrays shorter
    * than n yield an empty shingle set. Backed by the native
    * [[VectorExpressions.DistinctShingles]] kernel for n >= 2 — the
    * higher-order-function formulation it replaces evaluated its lambda
    * through interpreted per-element projections, dominating every
    * shingle-profile scan (q97 measured ~3x end-to-end).
    */
  def shingles(tokens: Column, n: Int): Column = {
    require(n >= 1, "shingle size must be >= 1")
    if (n == 1) array_distinct(tokens)
    else VectorExpressions.distinctShingles(tokens, n)
  }

  /** k-wide MinHash signature (array<long>) from a token array (n-grams
    * built natively); fewer tokens than shingleN yields null (no signal — matches cosine's null semantics).
    * Backed by the native [[VectorExpressions.MinHashSignature]] — one
    * base hash per shingle, k permutations; the higher-order-function
    * formulation this replaced re-hashed every shingle k times in
    * interpreted mode (HOFs are CodegenFallback) and was ~100x slower.
    * `portable = true` selects the [[PolyHash]] family (DuckDB-oracle-able,
    * 30-bit) instead of xxhash64 + multiply-shift (the production path).
    */
  def signature(tokens: Column, shingleN: Int, k: Int,
      portable: Boolean = false): Column =
    VectorExpressions.minhashSignature(tokens, shingleN, k, portable)

  /** Per-band 64-bit bucket keys straight from the shingle array (native
    * one-pass expression). Two docs agreeing on any full band collide;
    * for signature width k and bands b, the capture curve is
    * P(collide) = 1 - (1 - J^(k/b))^b. Use with `posexplode`: position =
    * band index, value = bucket key.
    */
  def bandBuckets(tokens: Column, shingleN: Int, k: Int, nBands: Int,
      portable: Boolean = false): Column =
    VectorExpressions.minhashBandBuckets(tokens, shingleN, k, nBands, portable)

  /** Fraction of agreeing signature positions — the Jaccard estimate. */
  def estJaccard(a: Column, b: Column): Column =
    when(a.isNull || b.isNull, lit(null))
      .otherwise(
        size(filter(zip_with(a, b, (x, y) => x === y), p => p)).cast("double") / size(a))

  /** (id, sig, band, bucket) — the shared explode stage behind
    * [[candidatePairs]] and [[oversizedBuckets]].
    *
    * OUTER explode + a cheap filter on the generator OUTPUT, deliberately:
    * a plain posexplode makes Catalyst infer `size(bands) > 0 AND
    * isnotnull(bands)` below the Generate and push it into the SCAN,
    * where substituting the defining expression re-evaluates the
    * signature kernel twice more per row (round-4 plan audit). The outer
    * variant infers nothing; null-signature docs surface as one null-band
    * row and are dropped by an attribute-only filter that cannot be
    * pushed through the kernel projection.
    */
  private[graft] def explodedBands(
      docs: DataFrame, idCol: String, tokensCol: String,
      shingleN: Int, k: Int, nBands: Int, portable: Boolean): DataFrame =
    docs
      .select(col(idCol).as("id"),
        signature(col(tokensCol), shingleN, k, portable).as("sig"),
        bandBuckets(col(tokensCol), shingleN, k, nBands, portable).as("bands"))
      .select(col("id"), col("sig"),
        posexplode_outer(col("bands")).as(Seq("band", "bucket")))
      .filter(col("band").isNotNull)
      .select(col("band"), col("bucket"), col("id"), col("sig"))

  /** End-to-end candidate generation: docs(idCol, tokensCol) → candidate
    * pairs (id_a, id_b, est_jaccard ≥ minJaccard). Plan shape: ONE scan
    * computing signatures, explode ×nBands, ONE shuffle on (band, bucket)
    * feeding a window bucket-size count, per-bucket self-join over the
    * same partitioning, pair dedup, estimator filter. The bucket-size
    * guard is a WINDOW count rather than a groupBy+join so the self-join's
    * two sides are identical subplans over one exchange (ReusedExchange) —
    * the earlier aggregate-and-join formulation made Catalyst plan FOUR
    * independent scans, each re-running the signature kernel. Buckets
    * larger than `maxBucket` are SILENTLY EXCLUDED from the join
    * (degenerate-cluster guard — a boilerplate cluster of size m would
    * contribute m²/2 pairs to one task); run [[oversizedBuckets]] with the
    * same arguments to see what the guard dropped.
    */
  def candidatePairs(
      docs: DataFrame, idCol: String, tokensCol: String,
      shingleN: Int = 2, k: Int = 64, nBands: Int = 8,
      minJaccard: Double = 0.5, maxBucket: Int = 1000,
      portable: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val exploded = explodedBands(docs, idCol, tokensCol, shingleN, k, nBands, portable)

    // degenerate-bucket guard: windowed count over the (band, bucket)
    // partitioning the join needs anyway
    val joinable = exploded
      .withColumn("bucket_size",
        count(lit(1)).over(Window.partitionBy("band", "bucket")))
      .filter(col("bucket_size") > 1 && col("bucket_size") <= maxBucket)

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

  /** The asymmetric index-probe at the heart of incremental dedup (q79
    * and the streaming [[graft.streaming.IncrementalIndex]] sink): given
    * an existing corpus's posting lists (band, bucket, id) + signatures
    * (id, sig), and a NEW slice's bands + signatures, emit exactly two
    * pair classes — new-vs-old and new-vs-new — with the signature-
    * agreement Jaccard estimate. Old-vs-old pairs are never formed, so
    * probe cost scales with the new slice, not the corpus. The
    * degenerate-bucket guard counts index + new occupancy together
    * (scanning the 12-byte index rows, not re-banding), giving the same
    * guarded bucket set a batch rebuild over the union would keep.
    * Requires globally disjoint old/new id spaces (pairs are oriented
    * id_a < id_b via least/greatest).
    */
  def incrementalProbe(idxBands: DataFrame, idxSigs: DataFrame,
      newBands: DataFrame, newSigs: DataFrame,
      maxBucket: Int, minJaccard: Double): DataFrame = {
    val sized = idxBands.unionByName(newBands)
      .groupBy("band", "bucket").agg(count(lit(1)).as("__bs"))
      .filter(col("__bs") > 1 && col("__bs") <= maxBucket)
      .select("band", "bucket")
    val idxJ = idxBands.join(sized, Seq("band", "bucket"))
    val newJ = newBands.join(sized, Seq("band", "bucket"))
    val newOld = newJ.select(col("band"), col("bucket"), col("id").as("id_n"))
      .join(idxJ.select(col("band"), col("bucket"), col("id").as("id_o")),
        Seq("band", "bucket"))
      .filter(col("id_n") =!= col("id_o"))
      .select(least(col("id_n"), col("id_o")).as("id_a"),
        greatest(col("id_n"), col("id_o")).as("id_b"), lit("new_old").as("kind"))
    val newNew = newJ.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(newJ.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), lit("new_new").as("kind"))
    val sigs = idxSigs.unionByName(newSigs)
    newOld.unionByName(newNew).distinct()
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("kind"),
        estJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .filter(col("est_jaccard") >= minJaccard)
  }

  /** BATCH-semantics candidate pairs FROM a posting-list layout — the
    * same algorithm as [[candidatePairs]]' tail (windowed bucket-size
    * guard, per-bucket self-join, pair dedup, estimator filter), but
    * starting from already-banded `(band, bucket, id)` rows and an
    * `(id, sig)` signature table instead of re-banding documents. This
    * is how a MAINTAINED index serves the slicing-independent pair set:
    * [[incrementalProbe]] guards buckets by their occupancy AT PROBE
    * TIME, so a bucket that grows past `maxBucket` across later batches
    * keeps its early pairs in the cumulative probe output (the eager,
    * low-latency signal); deriving pairs from the accumulated postings
    * applies the guard to the FINAL occupancy — exactly what
    * `candidatePairs` over the ingested union would emit, however the
    * ingest was sliced (the [[graft.streaming.CurationFunnelStream]]
    * ledger's edge source, certified by its q237-oracle gate).
    */
  def pairsFromPostings(bands: DataFrame, sigs: DataFrame,
      maxBucket: Int, minJaccard: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joinable = bands
      .withColumn("bucket_size",
        count(lit(1)).over(Window.partitionBy("band", "bucket")))
      .filter(col("bucket_size") > 1 && col("bucket_size") <= maxBucket)
      .select("band", "bucket", "id")
    joinable.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(joinable.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        estJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .filter(col("est_jaccard") >= minJaccard)
  }

  /** The buckets [[candidatePairs]]' degenerate-cluster guard excluded:
    * (band, bucket, bucket_size) with bucket_size > maxBucket. Same
    * signature/banding arguments → same buckets. At scale this is the
    * triage surface for boilerplate clusters (an oversized bucket means
    * thousands of near-identical documents — usually worth a targeted
    * exact-dedup pass rather than pairwise scoring).
    */
  def oversizedBuckets(
      docs: DataFrame, idCol: String, tokensCol: String,
      shingleN: Int = 2, k: Int = 64, nBands: Int = 8,
      maxBucket: Int = 1000, portable: Boolean = false): DataFrame =
    explodedBands(docs, idCol, tokensCol, shingleN, k, nBands, portable)
      .groupBy("band", "bucket")
      .agg(count(lit(1)).as("bucket_size"))
      .filter(col("bucket_size") > maxBucket)
}
