package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorExpressions
import graft.functions.VectorExpressions.AudioLandmarks.{FrameLen, EnergyMask}

/** The audio-landmark kernel and the q200 near-dup chain: hand-computed
  * fingerprints, the time-shift invariance that motivates the landmark
  * scheme, the short-signal null, and the planted near-dup pair on the
  * driver fixture.
  */
class AudioFingerprintSpec extends SparkSpec {
  import spark.implicits._

  private def fpsOf(text: String): Option[Seq[Long]] = {
    val r = Seq(text).toDF("t")
      .select(VectorExpressions.audioLandmarks(col("t")).as("f"))
      .collect()(0)
    if (r.isNullAt(0)) None else Some(r.getSeq[Long](0))
  }

  /** One frame of a single repeated character. */
  private def frame(c: Char): String = c.toString * FrameLen

  test("hand-computed fingerprint on a crafted two-peak signal") {
    // frames: a z a z a a → energies 1552 1952 1552 1952 1552 1552;
    // peaks at frames 1 and 3 (strict-left, at-or-above-right);
    // one landmark: (1952 & 0xFFF)<<20 | (1952 & 0xFFF)<<8 | dt=2
    val sig = frame('a') + frame('z') + frame('a') + frame('z') +
      frame('a') + frame('a')
    val e = ('z'.toLong * FrameLen) & EnergyMask
    assert(fpsOf(sig).contains(Seq((e << 20) | (e << 8) | 2L)))
  }

  test("time-shift invariance: a leading frame moves peaks, not landmarks") {
    val base = frame('a') + frame('z') + frame('a') + frame('q') +
      frame('a') + frame('z') + frame('a') + frame('a')
    val shifted = frame('b') + base
    val (f1, f2) = (fpsOf(base).get, fpsOf(shifted).get)
    assert(f1.nonEmpty && f1 == f2,
      s"landmarks should survive a whole-frame shift: $f1 vs $f2")
  }

  test("signals shorter than 3 complete frames have no fingerprints") {
    assert(fpsOf("x" * (3 * FrameLen - 1)).isEmpty) // 2 complete frames
    // 3 flat frames: defined, but no peak → empty fingerprint list
    assert(fpsOf("x" * (3 * FrameLen)).contains(Seq.empty))
  }

  test("q200 finds the planted near-dup pair on the driver fixture") {
    val rows = LlmOps.q200AudioFingerprint(spark, "/root/testdata/sf0.01")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // docs 107 and 387 are near-identical audio-kind payloads
    assert(rows.contains((107L, 387L)), s"planted pair missing: ${rows.keys}")
    val (shared, ppm, flag) = rows((107L, 387L))
    assert(shared >= 3L && ppm == 1000000L && flag == 1L)
    // single-landmark coincidences surface as candidates but stay unflagged
    assert(rows.values.forall { case (n, _, f) => f == 0L || n >= 3L },
      "a near-dup flag needs at least AudioMinShared shared landmarks")
  }

  test("audio_landmarks is registered as a SQL function") {
    graft.GraftExtensions.register(spark)
    val sig = frame('a') + frame('z') + frame('a') + frame('z') +
      frame('a') + frame('a')
    val got = spark.sql(s"SELECT audio_landmarks('$sig') AS f")
      .collect()(0).getSeq[Long](0)
    assert(got.length == 1)
  }
}
