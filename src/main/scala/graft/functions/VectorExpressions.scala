package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the vector/text extension surface
  * (SURVEY.md §7.5). A codegen'd `Expression` keeps the hot loop inside
  * whole-stage codegen — no boxing, no UDF serialization — which matters
  * when this runs per candidate pair over billions of rows.
  */
object VectorExpressions {

  /** Cosine similarity between two numeric arrays (float or double
    * elements), computed in double with one sequential pass — the operand
    * order is fixed so results are bitwise-reproducible across engines.
    * Returns null if either input is null or lengths differ.
    */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "cosine_similarity"

    @inline private def elemIsFloat(e: Expression): Boolean =
      e.dataType.asInstanceOf[ArrayType].elementType == FloatType

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      def ok(dt: DataType) = dt match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
        case _ => false
      }
      if (ok(left.dataType) && ok(right.dataType))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float> or array<double> inputs, " +
            s"got ${left.dataType.sql} and ${right.dataType.sql}")
    }

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n != b.numElements()) return null
      val af = elemIsFloat(left); val bf = elemIsFloat(right)
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        // A null element makes the whole similarity undefined (reading it
        // as 0.0 would silently skew the result).
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0.0 || nb == 0.0) null
      else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val leftGen = left.genCode(ctx)
      val rightGen = right.genCode(ctx)
      val aGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
      val bGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
      val a = leftGen.value; val b = rightGen.value
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val hasNull = ctx.freshName("hasNull")
      val code =
        code"""
          ${leftGen.code}
          ${rightGen.code}
          boolean ${ev.isNull} = true;
          double ${ev.value} = 0.0;
          if (!${leftGen.isNull} && !${rightGen.isNull}) {
            int $n = $a.numElements();
            if ($n == $b.numElements()) {
              double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
              boolean ${hasNull} = false;
              for (int $i = 0; $i < $n; $i++) {
                if ($a.isNullAt($i) || $b.isNullAt($i)) { ${hasNull} = true; break; }
                double x = (double) $a.$aGet($i);
                double y = (double) $b.$bGet($i);
                $dot += x * y; $na += x * x; $nb += y * y;
              }
              if (!${hasNull} && $na != 0.0 && $nb != 0.0) {
                ${ev.isNull} = false;
                ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
              }
            }
          }
        """
      ev.copy(code = code)
    }

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** 64-bit SimHash over an array<string> of tokens: each token's xxhash64
    * votes ±1 per bit position; the sign of each accumulated vote becomes
    * the output bit. Near-duplicate texts land within a small Hamming
    * distance, so candidates can be found by banding the 64 bits — no
    * pairwise comparison of the corpus (SURVEY.md §7.5 dedup).
    */
  case class SimHash64(child: Expression) extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "simhash64"

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case dt =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires array<string>, got ${dt.sql}")
      }

    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val votes = new Array[Int](64)
      var t = 0
      val n = arr.numElements()
      while (t < n) {
        if (!arr.isNullAt(t)) {
          val h = XxHash64Function.hash(arr.getUTF8String(t), StringType, 42L)
          var bit = 0
          while (bit < 64) {
            if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
            bit += 1
          }
        }
        t += 1
      }
      var out = 0L
      var bit = 0
      while (bit < 64) {
        if (votes(bit) > 0) out |= (1L << bit)
        bit += 1
      }
      java.lang.Long.valueOf(out)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Shared MinHash kernel: word n-grams are built natively from the token
    * array (UTF8String concat — the higher-order-function shingle builder
    * cost ~20µs per gram interpreted, dominating the whole near-dup
    * pass), each gram is xxhash64'd ONCE, then k multiply-shift
    * permutations π_i(h) = a_i·h + b_i (a_i odd; 64-bit wrap-around — a
    * bijection on Z/2⁶⁴, an approximately min-wise independent family)
    * update k running minima. Duplicates need no dedup — the minimum is
    * multiset-invariant. Coefficients come from SplitMix64(i), so
    * signatures are deterministic across runs. Grams containing a null
    * token are skipped; fewer tokens than shingleN → null (no signal).
    */
  sealed trait MinHashKernel { self: UnaryExpression =>
    def shingleN: Int
    def k: Int
    /** false → xxhash64 base + 64-bit multiply-shift permutations (the
      * production path: faster, 64-bit keyspace, Spark-only); true → the
      * [[PolyHash]] family (Horner mod 1e9+7 base, (a·h+b) mod p
      * permutations) — bit-identical in DuckDB, so portable-keyed queries
      * can carry a full oracle (round-3 verdict item 1).
      */
    def portable: Boolean

    protected def checkTokensType(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      self.child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case dt =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"${self.prettyName} requires array<string>, got ${dt.sql}")
      }

    private def splitmix(x0: Long): Long = {
      var z = x0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    @transient private lazy val coefA: Array[Long] =
      if (portable) Array.tabulate(k)(PolyHash.coefA)
      else Array.tabulate(k)(i => splitmix(2L * i) | 1L)
    @transient private lazy val coefB: Array[Long] =
      if (portable) Array.tabulate(k)(PolyHash.coefB)
      else Array.tabulate(k)(i => splitmix(2L * i + 1))
    @transient private lazy val sep = UTF8String.fromString(" ")

    /** k minima over the n-gram hashes, or null if no complete gram. */
    protected def minima(v: Any): Array[Long] = {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n < shingleN) return null
      val mins = Array.fill(k)(Long.MaxValue)
      var seen = false
      val parts = new Array[UTF8String](shingleN)
      val isPortable = portable
      var t = 0
      while (t <= n - shingleN) {
        var ok = true
        var j = 0
        while (j < shingleN && ok) {
          if (arr.isNullAt(t + j)) ok = false
          else parts(j) = arr.getUTF8String(t + j)
          j += 1
        }
        if (ok) {
          seen = true
          val gram =
            if (shingleN == 1) parts(0)
            else UTF8String.concatWs(sep, parts: _*)
          val base =
            if (isPortable) PolyHash.horner(gram.toString)
            else XxHash64Function.hash(gram, StringType, 42L)
          var i = 0
          while (i < k) {
            val h =
              if (isPortable) (base * coefA(i) + coefB(i)) % PolyHash.Mod
              else base * coefA(i) + coefB(i)
            if (h < mins(i)) mins(i) = h
            i += 1
          }
        }
        t += 1
      }
      if (!seen) null else mins
    }
  }

  /** k-wide MinHash signature (array<long>) from a TOKEN array; n-grams
    * built internally (see [[MinHashKernel]]).
    */
  case class MinHashSignature(
      child: Expression, shingleN: Int, k: Int, portable: Boolean = false)
      extends UnaryExpression with MinHashKernel
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

    require(k >= 1 && shingleN >= 1, "signature width and shingle size must be >= 1")

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "minhash_signature"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      checkTokensType()

    override def nullSafeEval(v: Any): Any = {
      val mins = minima(v)
      if (mins == null) null
      else new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** LSH band buckets straight from the TOKEN array: computes the k-wide
    * minima internally (same kernel as [[MinHashSignature]]) and folds
    * each of the `nBands` contiguous groups of k/nBands minima into one
    * 64-bit bucket key — a single pass per row. Exists as its own
    * expression because referencing a signature column from several band
    * expressions re-evaluates the signature per reference once Catalyst
    * collapses the projections (expressions are not CSE'd in the
    * interpreted path).
    */
  case class MinHashBandBuckets(
      child: Expression, shingleN: Int, k: Int, nBands: Int, portable: Boolean = false)
      extends UnaryExpression with MinHashKernel
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

    require(k >= 1 && nBands >= 1 && k % nBands == 0,
      s"bands ($nBands) must divide signature width ($k)")

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "minhash_band_buckets"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      checkTokensType()

    override def nullSafeEval(v: Any): Any = {
      val mins = minima(v)
      if (mins == null) return null
      val r = k / nBands
      val buckets = new Array[Long](nBands)
      var b = 0
      while (b < nBands) {
        var h = if (portable) PolyHash.BandSeed else 42L
        var j = 0
        while (j < r) {
          h =
            if (portable) (h * PolyHash.BandBase + mins(b * r + j)) % PolyHash.Mod
            else XxHash64Function.hash(mins(b * r + j), LongType, h)
          j += 1
        }
        buckets(b) = h
        b += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(buckets)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Engine-portable 30-bit SimHash over an array<string> of tokens: each
    * token's [[PolyHash.horner]] hash (mod 1e9+7 < 2^30, so bits 0–29 carry
    * signal) votes ±1 per bit position; positive vote → bit set. Same
    * banding algebra as [[SimHash64]] at 3×10-bit bands. Exists alongside
    * the 64-bit xxhash64 variant so the SimHash banding query can carry a
    * full DuckDB oracle — the oracle recomputes identical integer votes.
    * Code-point-based ([[PolyHash.horner]]), so parity holds for all
    * text, non-BMP included; oracled callers still filter to lang = 'en'
    * as a corpus choice.
    */
  /** Perceptual-hash band values for a media payload's textual stand-in
    * (the multimodal fake-decode discipline — a real pipeline feeds
    * decoded pixel-block luminance through the SAME shape): the first
    * [[PHashBands.ThumbChars]] code points are the "thumbnail", split
    * into 64 position blocks; block bit = 1 iff the block's code-point
    * sum exceeds the thumbnail mean (`blockSum·64 > total`, exact
    * integer — no division); bits pack into 4×16-bit band values
    * (array<long>), which double as the LSH bucket keys, so Hamming
    * distance is Σ bit_count(band_a XOR band_b) with no 64-bit packing
    * (a `1<<63` term would need unsigned algebra in the oracle).
    * Thumbnails shorter than 64 code points yield null (a real pHash
    * needs a minimum image size). Engine-portable: the DuckDB oracle
    * rebuilds identical integer block sums from `ord()`.
    */
  case class PHashBands(child: Expression) extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    import PHashBands._

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "phash_bands"

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case dt =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires string, got ${dt.sql}")
      }

    override def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
      // thumbnail: first ThumbChars code points
      val cps = new Array[Long](ThumbChars)
      var n = 0
      var i = 0
      while (i < s.length && n < ThumbChars) {
        val cp = s.codePointAt(i)
        cps(n) = cp.toLong
        n += 1
        i += java.lang.Character.charCount(cp)
      }
      if (n < Blocks) return null
      val blockSums = new Array[Long](Blocks)
      var total = 0L
      i = 0
      while (i < n) {
        blockSums((i * Blocks / n).toInt) += cps(i)
        total += cps(i)
        i += 1
      }
      val bands = new Array[Long](NBands)
      var b = 0
      while (b < Blocks) {
        if (blockSums(b) * Blocks > total)
          bands(b / BandBits) |= (1L << (b % BandBits))
        b += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(bands)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  object PHashBands {
    val ThumbChars = 256
    val Blocks = 64
    val NBands = 4
    val BandBits = 16
  }

  /** Landmark fingerprints for an audio payload's textual stand-in (the
    * multimodal fake-decode discipline, the audio sibling of
    * [[PHashBands]] — a real pipeline feeds PCM frame energies through
    * the SAME shape): the first [[AudioLandmarks.SigChars]] code points
    * are the "signal"; complete frames of [[AudioLandmarks.FrameLen]]
    * samples get an integer energy (code-point sum); peaks are frames
    * strictly above their left neighbor and at-or-above their right
    * (the deterministic tie-break); each peak pairs with its next TWO
    * peaks (the constellation fan-out of the landmark-hashing scheme —
    * Wang 2003, "An Industrial-Strength Audio Search Algorithm") into a
    * packed fingerprint
    * `(e1 & 0xFFF) << 20 | (e2 & 0xFFF) << 8 | min(Δframes, 255)`.
    * Signals shorter than 3 complete frames yield null (no peak can
    * exist); few-peaked signals yield an empty array. All-integer, so
    * the DuckDB oracle rebuilds identical fingerprints from `ord()`.
    */
  case class AudioLandmarks(child: Expression) extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    import AudioLandmarks._

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "audio_landmarks"

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case dt =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires string, got ${dt.sql}")
      }

    override def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
      // signal: first SigChars code points
      val cps = new Array[Long](SigChars)
      var n = 0
      var i = 0
      while (i < s.length && n < SigChars) {
        val cp = s.codePointAt(i)
        cps(n) = cp.toLong
        n += 1
        i += java.lang.Character.charCount(cp)
      }
      val frames = n / FrameLen // complete frames only
      if (frames < 3) return null
      val energy = new Array[Long](frames)
      i = 0
      while (i < frames * FrameLen) {
        energy(i / FrameLen) += cps(i)
        i += 1
      }
      // peaks: strict left, at-or-above right
      val peaks = new scala.collection.mutable.ArrayBuffer[Int](frames)
      var f = 1
      while (f < frames - 1) {
        if (energy(f) > energy(f - 1) && energy(f) >= energy(f + 1)) peaks += f
        f += 1
      }
      val fps = new scala.collection.mutable.ArrayBuffer[Long](2 * peaks.length)
      var p = 0
      while (p < peaks.length) {
        var j = p + 1
        while (j <= p + FanOut && j < peaks.length) {
          val e1 = energy(peaks(p)) & EnergyMask
          val e2 = energy(peaks(j)) & EnergyMask
          val dt = math.min((peaks(j) - peaks(p)).toLong, MaxDt)
          fps += (e1 << 20) | (e2 << 8) | dt
          j += 1
        }
        p += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(fps.toArray)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  object AudioLandmarks {
    val SigChars = 512
    val FrameLen = 16
    val FanOut = 2
    val EnergyMask = 0xFFFL
    val MaxDt = 255L
  }

  case class PolySimHash(child: Expression) extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "poly_simhash"

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case dt =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires array<string>, got ${dt.sql}")
      }

    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val votes = new Array[Int](30)
      var t = 0
      val n = arr.numElements()
      while (t < n) {
        if (!arr.isNullAt(t)) {
          val h = PolyHash.horner(arr.getUTF8String(t).toString)
          var bit = 0
          while (bit < 30) {
            if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
            bit += 1
          }
        }
        t += 1
      }
      var out = 0L
      var bit = 0
      while (bit < 30) {
        if (votes(bit) > 0) out |= (1L << bit)
        bit += 1
      }
      java.lang.Long.valueOf(out)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Winnowed rolling-hash fingerprints (the MOSS scheme) over a STRING:
    * character k-grams hashed by Horner's rule (base 257 mod 1e9+7 —
    * plain integer arithmetic, bit-identical in any engine), then the
    * minimum of each sliding window of `window` hashes, distinct, in
    * first-occurrence order. Intended for ASCII text (char codes ==
    * code points — the oracle's ord() semantics). Null/short input →
    * null; fewer grams than `window` → empty array. Native for the same
    * reason as the MinHash kernel: the higher-order-function formulation
    * evaluates one interpreted lambda per character.
    */
  case class RollingFingerprints(child: Expression, k: Int, window: Int)
      extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

    require(k >= 1 && window >= 1, "gram size and window must be >= 1")
    private val Mod = 1000000007L
    private val Base = 257L

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "rolling_fingerprints"

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case dt =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires string, got ${dt.sql}")
      }

    override def nullSafeEval(v: Any): Any = {
      // Decode to code points once: the oracle engine's substr()/ord()
      // count CHARACTERS (code points), so both gram segmentation and the
      // per-character hash values must be code-point-based — iterating
      // UTF-16 units would mis-slice and mis-hash non-BMP text (r4 advice).
      val cps = v.asInstanceOf[UTF8String].toString.codePoints().toArray
      val n = cps.length
      if (n < k) return null
      val m = n - k + 1
      val hs = new Array[Long](m)
      var i = 0
      while (i < m) {
        var h = 0L
        var j = 0
        while (j < k) {
          h = (h * Base + cps(i + j)) % Mod
          j += 1
        }
        hs(i) = h
        i += 1
      }
      val out = new java.util.LinkedHashSet[Long]()
      var w = 0
      while (w <= m - window) {
        var mn = Long.MaxValue
        var j = 0
        while (j < window) {
          if (hs(w + j) < mn) mn = hs(w + j)
          j += 1
        }
        out.add(mn)
        w += 1
      }
      val arr = new Array[Long](out.size)
      val it = out.iterator
      var x = 0
      while (it.hasNext) { arr(x) = it.next(); x += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Scalar [[PolyHash.horner]] of a STRING — the engine-portable content
    * hash as a standalone expression (the kernels above embed it per
    * token/gram; q62's stratified sampler needs it per document). Null in
    * → null out; codegen is one static call per row.
    */
  case class HornerHash(child: Expression) extends UnaryExpression {

    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "poly_horner"

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case dt =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires a string input, got ${dt.sql}")
      }

    override def nullSafeEval(v: Any): Any =
      java.lang.Long.valueOf(PolyHash.horner(v.asInstanceOf[UTF8String].toString))

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.PolyHash.horner($c.toString())")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Integer-quantized squared L2 norm of a float/double array: each
    * component is scaled by 2^20 (exact on a float value held in a
    * double), rounded half-away-from-zero (engine-identical — the q81
    * convention), squared and summed as LONGS, so the result is an
    * exact integer both engines compute bit-identically — a float
    * norm summed in shuffle order would be last-ulp nondeterministic.
    * Null elements make the norm undefined (null), matching
    * [[CosineSimilarity]]. Eval-mode like the other whole-array
    * kernels. Headroom: |x| ≤ 2^11 at dim ≤ 2^12 stays under 2^63.
    */
  case class QuantNormSq(child: Expression) extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "quant_norm_sq"

    @inline private def elemIsFloat: Boolean =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case dt =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires array<float> or array<double>, got ${dt.sql}")
      }

    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      val isFloat = elemIsFloat
      var acc = 0L
      var i = 0
      while (i < n) {
        if (a.isNullAt(i)) return null
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val q = Math.round(Math.abs(x) * 1048576.0) * (if (x < 0) -1L else 1L)
        acc += q * q
        i += 1
      }
      java.lang.Long.valueOf(acc)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Integer-quantized dot product of two float/double arrays: each
    * component quantized exactly like [[QuantNormSq]] (·2^20, rounded
    * half-away-from-zero), then multiplied and summed as LONGS — the
    * exact-integer similarity score for late-interaction retrieval
    * (q112) and hard-negative mining, where a float dot summed in
    * shuffle order would be last-ulp nondeterministic across engines.
    * Length mismatch or any null element makes the product undefined
    * (null), matching [[CosineSimilarity]]. Eval-mode like the other
    * whole-array kernels. Headroom: |x|,|y| ≤ 2 quantize to ≤ 2^21, so
    * each term is ≤ 2^42 and 2^12 dims stay under 2^54 — no overflow.
    */
  case class QuantDot(left: Expression, right: Expression)
      extends BinaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "quant_dot"

    @inline private def elemIsFloat(e: Expression): Boolean =
      e.dataType.asInstanceOf[ArrayType].elementType == FloatType

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      def ok(dt: DataType) = dt match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
        case _ => false
      }
      if (ok(left.dataType) && ok(right.dataType))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float> or array<double> inputs, " +
            s"got ${left.dataType.sql} and ${right.dataType.sql}")
    }

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n != b.numElements()) return null
      val af = elemIsFloat(left); val bf = elemIsFloat(right)
      var acc = 0L
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
        val qx = Math.round(Math.abs(x) * 1048576.0) * (if (x < 0) -1L else 1L)
        val qy = Math.round(Math.abs(y) * 1048576.0) * (if (y < 0) -1L else 1L)
        acc += qx * qy
        i += 1
      }
      java.lang.Long.valueOf(acc)
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Distinct word n-gram shingles from a TOKEN array, built in one
    * compiled pass (insertion-ordered hash set over UTF8String, so the
    * output order is first-appearance — deterministic). Exists because
    * the higher-order-function formulation this replaces —
    * `array_distinct(transform(sequence(...), i => concat_ws(...)))` —
    * evaluates its lambda through interpreted per-element projections,
    * which dominated the q97 containment scan (the q75/q70 lesson, but
    * for a shape that NEEDS the per-document distinct, so the codegen'd
    * integer-explode rewrite doesn't apply without adding a shuffle).
    * Eval-mode (CodegenFallback) like the other whole-array kernels
    * here: the compiled loop is the work, the per-row virtual call is
    * noise. Null tokens inside a gram are skipped by the separator join
    * (concat_ws semantics — bit-identical to the HOF it replaces);
    * arrays shorter than n yield an EMPTY array (the `MinHash.shingles`
    * guard, NOT the null of the signature kernels).
    */
  case class DistinctShingles(child: Expression, shingleN: Int)
      extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

    require(shingleN >= 2,
      "1-gram shingles are array_distinct(tokens) — already codegen'd")

    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "distinct_shingles"
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case dt =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires array<string>, got ${dt.sql}")
      }

    @transient private lazy val sep = UTF8String.fromString(" ")

    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val out = new java.util.LinkedHashSet[UTF8String]
      val parts = new Array[UTF8String](shingleN)
      var t = 0
      while (t <= n - shingleN) {
        var j = 0
        while (j < shingleN) {
          parts(j) = if (arr.isNullAt(t + j)) null else arr.getUTF8String(t + j)
          j += 1
        }
        out.add(UTF8String.concatWs(sep, parts: _*))
        t += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        out.toArray.asInstanceOf[Array[AnyRef]])
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  // ---- Column-level API --------------------------------------------------

  /** poly_horner(text) — engine-portable scalar content hash. */
  def hornerHash(text: Column): Column =
    GraftColumnBridge.column(HornerHash(GraftColumnBridge.expression(text)))

  /** rolling_fingerprints(text, k, window) over a string column. */
  def rollingFingerprints(text: Column, k: Int, window: Int): Column =
    GraftColumnBridge.column(
      RollingFingerprints(GraftColumnBridge.expression(text), k, window))

  /** minhash_signature(tokens, shingleN, k) over an array<string> column. */
  def minhashSignature(tokens: Column, shingleN: Int, k: Int,
      portable: Boolean = false): Column =
    GraftColumnBridge.column(
      MinHashSignature(GraftColumnBridge.expression(tokens), shingleN, k, portable))

  /** minhash_band_buckets(tokens, shingleN, k, nBands) over an array<string> column. */
  def minhashBandBuckets(tokens: Column, shingleN: Int, k: Int, nBands: Int,
      portable: Boolean = false): Column =
    GraftColumnBridge.column(
      MinHashBandBuckets(GraftColumnBridge.expression(tokens), shingleN, k, nBands, portable))

  /** quant_norm_sq(vec) — exact integer-quantized squared L2 norm. */
  def quantNormSq(vec: Column): Column =
    GraftColumnBridge.column(QuantNormSq(GraftColumnBridge.expression(vec)))

  /** quant_dot(a, b) — exact integer-quantized dot product. */
  def quantDot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      QuantDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** distinct_shingles(tokens, n) over an array<string> column (n >= 2). */
  def distinctShingles(tokens: Column, n: Int): Column =
    GraftColumnBridge.column(
      DistinctShingles(GraftColumnBridge.expression(tokens), n))

  /** poly_simhash(tokens) — engine-portable 30-bit simhash. */
  def polySimhash(tokens: Column): Column =
    GraftColumnBridge.column(PolySimHash(GraftColumnBridge.expression(tokens)))

  /** phash_bands(str) — 4×16-bit perceptual-hash band values. */
  def phashBands(str: Column): Column =
    GraftColumnBridge.column(PHashBands(GraftColumnBridge.expression(str)))

  /** audio_landmarks(text) — landmark fingerprints of the audio stand-in. */
  def audioLandmarks(str: Column): Column =
    GraftColumnBridge.column(AudioLandmarks(GraftColumnBridge.expression(str)))


  /** cosine(a, b) over array<float>/array<double> columns. */
  def cosine(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      CosineSimilarity(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** simhash64(tokens) over an array<string> column. */
  def simhash64(tokens: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(tokens)))
}
