package graft.queries

import graft.SparkSpec

/** The q193 APPLY against planted cross-document repeated passages:
  * the oracle gate certifies engine parity on the fixture corpus, this
  * spec carries the other half — the purge actually removes exactly
  * the planted spans, keeps exactly the first occurrence, and rebuilds
  * the surviving text byte-for-byte.
  */
class SpanPurgeSpec extends SparkSpec {
  import spark.implicits._

  /** w{base}..w{base+n-1} — n distinct tokens. */
  private def toks(base: Int, n: Int): Seq[String] =
    (base until base + n).map(i => s"w$i")

  private val passage = toks(1000, 32) // the planted 32-token chunk
  private val tail8 = toks(2000, 8)    // a repeated SHORT tail

  // docA: three unique chunks — untouched
  private val docA = toks(0, 96)
  // docB: chunk0 = passage (dup of docC c1? no — see below), chunk1
  // unique, chunk2 = passage again (within-doc repeat, chunk-aligned)
  private val docB = passage ++ toks(300, 32) ++ passage
  // docC: unique chunk + the repeated short tail (tails never purge)
  private val docC = toks(400, 32) ++ tail8
  // docD: chunk0 = docC's chunk0 content (cross-doc dup) + same tail
  private val docD = toks(400, 32) ++ tail8

  private def corpus = Seq(
    (1L, "s1", docA.mkString(" ")),
    (2L, "s1", docB.mkString(" ")),
    (3L, "s2", docC.mkString(" ")),
    (4L, "s2", docD.mkString(" "))
  ).toDF("doc_id", "source", "text")

  private def purged: Map[Long, org.apache.spark.sql.Row] =
    Corpus.spanPurge(corpus).collect().map(r => r.getLong(0) -> r).toMap

  test("first occurrence survives, later occurrences drop — incl. within-doc") {
    val p = purged
    // docB: chunk0 holds the passage first (doc 2 < nobody else has it
    // earlier); chunk2 repeats it within the same doc and must drop
    assert(p(2L).getString(2) == (passage ++ toks(300, 32)).mkString(" "))
    assert(p(2L).getLong(4) == 64L && p(2L).getLong(5) == 32L)
  }

  test("cross-document dup keeps the lower (doc_id, chunk_id) copy") {
    val p = purged
    // docC (id 3) holds the first copy — fully intact
    assert(p(3L).getString(2) == docC.mkString(" "))
    assert(p(3L).getLong(5) == 0L)
    // docD (id 4) loses the 32-token chunk but keeps the short tail
    assert(p(4L).getString(2) == tail8.mkString(" "))
    assert(p(4L).getLong(4) == 8L && p(4L).getLong(5) == 32L)
  }

  test("sub-window tails are never dup-eligible") {
    val p = purged
    // the 8-token tail repeats across docs C and D yet survives in both
    assert(p(3L).getString(2).endsWith(tail8.mkString(" ")))
    assert(p(4L).getString(2) == tail8.mkString(" "))
  }

  test("untouched documents pass through whitespace-normalized") {
    val p = purged
    assert(p(1L).getString(2) == docA.mkString(" "))
    assert(p(1L).getLong(3) == 96L && p(1L).getLong(5) == 0L)
  }

  test("a document whose every chunk is repeated purges to empty") {
    val df = Seq(
      (1L, "s1", passage.mkString(" ")),
      (2L, "s1", passage.mkString(" "))
    ).toDF("doc_id", "source", "text")
    val p = Corpus.spanPurge(df).collect().map(r => r.getLong(0) -> r).toMap
    assert(p(1L).getString(2) == passage.mkString(" "))
    assert(p(2L).getString(2) == "" && p(2L).getLong(4) == 0L)
  }

  test("token accounting is exact: kept + purged = total, per doc") {
    purged.values.foreach { r =>
      assert(r.getLong(4) + r.getLong(5) == r.getLong(3))
    }
  }
}
