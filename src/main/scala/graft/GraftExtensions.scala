package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{BooleanType, IntegerType}

import graft.functions.{ExactDecimal, VectorExpressions}

/** SQL registration for graft's native expressions — the
  * `SparkSessionExtensions` hook (the public API for extending a session
  * at build time: `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`), plus
  * [[GraftExtensions.register]] for an already-built session. With this
  * the whole extension surface is reachable from pure SQL —
  * `SELECT cosine_similarity(a, b)`, `minhash_band_buckets(tokens, 2, 64,
  * 8)` — not only the Scala column API.
  *
  * Arity/type errors surface at ANALYSIS time with the function name (the
  * builders validate before constructing), matching built-in behavior.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(extensions: SparkSessionExtensions): Unit = {
    GraftExtensions.entries.foreach(extensions.injectFunction)
    // optimizer surface: config-gated (default OFF), so injection is
    // inert until spark.graft.windowToAggJoin.enabled=true /
    // spark.graft.mvRewrite.enabled=true (+ a registered MV)
    extensions.injectOptimizerRule(_ => graft.rules.WindowToAggJoin)
    extensions.injectOptimizerRule(_ => graft.rules.AggToMvRewrite.Installed)
  }
}

object GraftExtensions {

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an INT literal, got $other")
  }

  private def boolLit(e: Expression, fn: String, arg: String): Boolean = e match {
    case Literal(v: Boolean, BooleanType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a BOOLEAN literal, got $other")
  }

  private def arity(fn: String, args: Seq[Expression], n: Int*): Unit =
    require(n.contains(args.length),
      s"$fn expects ${n.mkString(" or ")} arguments, got ${args.length}")

  // 3-arg constructor: the long form validates group/since/source against
  // built-in whitelists; usage strings live in `entries` comments instead
  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name)

  /** (identifier, info, builder) triples — the exact shape
    * `injectFunction` consumes; also usable directly against a
    * FunctionRegistry (see [[register]]).
    */
  val entries: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", "cosine_similarity(a, b) - cosine of two float/double arrays"),
      (args: Seq[Expression]) => {
        arity("cosine_similarity", args, 2)
        VectorExpressions.CosineSimilarity(args(0), args(1))
      }),
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of an array<string>"),
      (args: Seq[Expression]) => {
        arity("simhash64", args, 1)
        VectorExpressions.SimHash64(args(0))
      }),
    (FunctionIdentifier("poly_simhash"),
      info("poly_simhash", "poly_simhash(tokens) - engine-portable 30-bit SimHash"),
      (args: Seq[Expression]) => {
        arity("poly_simhash", args, 1)
        VectorExpressions.PolySimHash(args(0))
      }),
    (FunctionIdentifier("phash_bands"),
      info("phash_bands", "phash_bands(str) - 4x16-bit perceptual-hash band values"),
      (args: Seq[Expression]) => {
        arity("phash_bands", args, 1)
        VectorExpressions.PHashBands(args(0))
      }),
    (FunctionIdentifier("audio_landmarks"),
      info("audio_landmarks",
        "audio_landmarks(str) - packed peak-pair landmark fingerprints of the audio stand-in"),
      (args: Seq[Expression]) => {
        arity("audio_landmarks", args, 1)
        VectorExpressions.AudioLandmarks(args(0))
      }),
    (FunctionIdentifier("minhash_signature"),
      info("minhash_signature",
        "minhash_signature(tokens, shingleN, k[, portable]) - k-wide MinHash signature"),
      (args: Seq[Expression]) => {
        arity("minhash_signature", args, 3, 4)
        VectorExpressions.MinHashSignature(args(0),
          intLit(args(1), "minhash_signature", "shingleN"),
          intLit(args(2), "minhash_signature", "k"),
          if (args.length == 4) boolLit(args(3), "minhash_signature", "portable") else false)
      }),
    (FunctionIdentifier("minhash_band_buckets"),
      info("minhash_band_buckets",
        "minhash_band_buckets(tokens, shingleN, k, nBands[, portable]) - LSH band bucket keys"),
      (args: Seq[Expression]) => {
        arity("minhash_band_buckets", args, 4, 5)
        VectorExpressions.MinHashBandBuckets(args(0),
          intLit(args(1), "minhash_band_buckets", "shingleN"),
          intLit(args(2), "minhash_band_buckets", "k"),
          intLit(args(3), "minhash_band_buckets", "nBands"),
          if (args.length == 5) boolLit(args(4), "minhash_band_buckets", "portable") else false)
      }),
    (FunctionIdentifier("poly_horner"),
      info("poly_horner", "poly_horner(text) - engine-portable scalar content hash (Horner mod 1e9+7)"),
      (args: Seq[Expression]) => {
        arity("poly_horner", args, 1)
        VectorExpressions.HornerHash(args(0))
      }),
    (FunctionIdentifier("rolling_fingerprints"),
      info("rolling_fingerprints",
        "rolling_fingerprints(text, k, window) - winnowed rolling-hash fingerprints"),
      (args: Seq[Expression]) => {
        arity("rolling_fingerprints", args, 3)
        VectorExpressions.RollingFingerprints(args(0),
          intLit(args(1), "rolling_fingerprints", "k"),
          intLit(args(2), "rolling_fingerprints", "window"))
      }),
    (FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(text) - Unicode NFC canonical composition"),
      (args: Seq[Expression]) => {
        arity("nfc_normalize", args, 1)
        graft.functions.TextNorm.NfcNormalize(args(0))
      }),
    (FunctionIdentifier("scaled_long"),
      info("scaled_long",
        "scaled_long(x, scale) - exact unscaled long of CAST(x AS DECIMAL(·, scale))"),
      (args: Seq[Expression]) => {
        arity("scaled_long", args, 2)
        ExactDecimal.ScaledLong(args(0), intLit(args(1), "scaled_long", "scale"))
      }),
    (FunctionIdentifier("morton_code"),
      info("morton_code",
        "morton_code(x, y, bits) - z-order interleave of the low bits of two bigints"),
      (args: Seq[Expression]) => {
        arity("morton_code", args, 3)
        graft.functions.ZOrder.MortonCode(args(0), args(1),
          intLit(args(2), "morton_code", "bits"))
      }))

  /** Late registration on an already-built session (the extensions hook
    * only runs at session construction). Idempotent.
    */
  def register(spark: SparkSession): Unit =
    entries.foreach { case (ident, inf, builder) =>
      org.apache.spark.sql.GraftColumnBridge.registerFunction(spark, ident, inf, builder)
    }
}
