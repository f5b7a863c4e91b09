package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The q111/q116/q117 audits against PLANTED violations. The DuckDB
  * oracle gate certifies engine parity on the (clean) fixture — where
  * orphan counts are all zero — so these specs carry the other half of
  * the evidence: the detectors actually fire, with exactly the right
  * numbers, when the data is broken.
  */
class AuditDetectionSpec extends SparkSpec {
  import spark.implicits._

  test("fkAudit counts planted orphans exactly (rows, keys, ppm)") {
    // child: keys 1..5, 10 rows each; parent covers only 1..3
    val counts = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L), (5L, 10L))
      .toDF("k", "cnt")
    val parent = Seq(1L, 2L, 3L).toDF("k")
    val row = Warehouse.fkAudit("t.fk->p", counts, parent).collect().head
    assert(row.getString(0) == "t.fk->p")
    assert(row.getLong(1) == 50L, "n_rows")
    assert(row.getLong(2) == 5L, "n_keys")
    assert(row.getLong(3) == 20L, "orphan_rows")
    assert(row.getLong(4) == 2L, "orphan_keys")
    assert(row.getLong(5) == 400000L, "orphan_ppm = 20/50")
  }

  test("fkAudit reports NULL FKs as orphans, never silently exempts them") {
    val counts = Seq((Some(1L), 5L), (None, 3L)).toDF("k", "cnt")
    val parent = Seq(1L).toDF("k")
    val row = Warehouse.fkAudit("t.fk->p", counts, parent).collect().head
    assert(row.getLong(3) == 3L, "null-FK rows are orphan_rows")
    assert(row.getLong(4) == 1L, "the null key is an orphan key")
  }

  /** Build the (key_name, k, cnt) counts frame skewRollup consumes. */
  private def countsOf(tag: String, keys: Seq[Long]) =
    keys.groupBy(identity).toSeq.map { case (k, v) => (tag, k, v.size.toLong) }
      .toDF("key_name", "k", "cnt")

  test("skewRollup isolates a planted hot key's exact mass") {
    // 90 rows on key 100, one row each on keys 0..9
    val counts = countsOf("t.k", Seq.fill(90)(100L) ++ (0L until 10L))
    val row = Warehouse.skewRollup(counts).collect().head
    assert(row.getString(0) == "t.k")
    assert(row.getLong(1) == 100L, "n_rows")
    assert(row.getLong(2) == 11L, "n_keys")
    assert(row.getLong(3) == 90L, "top1_rows")
    assert(row.getLong(4) == 99L, "top10_rows = hot + 9 singletons")
    assert(row.getLong(5) == 900000L && row.getLong(6) == 990000L)
  }

  test("skewRollup is deterministic under count ties (key-asc tiebreak)") {
    // 12 keys, all with the same count: top10 must be keys 0..9 by the
    // (cnt DESC, k ASC) total order, on every run
    val counts = countsOf("t.k", (0L until 12L).flatMap(k => Seq.fill(3)(k)))
    val rows = (1 to 3).map(_ => Warehouse.skewRollup(counts).collect().head)
    rows.foreach { r =>
      assert(r.getLong(3) == 3L, "top1 is a 3-count key")
      assert(r.getLong(4) == 30L, "top10 = 10 of the tied keys")
    }
  }

  test("skewRollup audits several keys independently in one pass") {
    // hot key under tag A, uniform keys under tag B: per-tag isolation
    val counts = countsOf("a.k", Seq.fill(50)(100L) ++ (0L until 50L))
      .unionByName(countsOf("b.k", (0L until 20L)))
    val out = Warehouse.skewRollup(counts).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("a.k").getLong(3) == 50L, "tag A top1 is the hot key")
    assert(out("a.k").getLong(5) == 500000L, "tag A top1_ppm")
    assert(out("b.k").getLong(3) == 1L, "tag B has no hot key")
    assert(out("b.k").getLong(4) == 10L, "tag B top10 = 10 singletons")
  }

  test("boilerplateAudit flags a planted within-source template") {
    // srcA: 3 of 4 docs share a 5-token template prefix; srcB: no repeats
    val tmpl = "cookie banner accept all terms"
    val docs = Seq(
      (1L, "srcA", s"$tmpl alpha beta gamma delta epsilon"),
      (2L, "srcA", s"$tmpl zeta eta theta iota kappa"),
      (3L, "srcA", s"$tmpl mu nu xi omicron pi"),
      (4L, "srcA", "rho sigma tau upsilon phi chi psi"),
      (5L, "srcB", "one two three four five six seven"),
      (6L, "srcB", "eight nine ten eleven twelve thirteen")
    ).toDF("doc_id", "source", "text")
    val out = LlmOps.boilerplateAudit(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("srcA")
    assert(a.getLong(1) == 4L, "srcA n_docs counts the clean doc too")
    // the shared prefix contributes its single 5-gram with df=3
    assert(a.getLong(2) == 1L, "one boilerplate shingle type")
    assert(a.getLong(3) == 3L, "three docs affected")
    assert(a.getLong(5) == 3L, "max_df")
    assert(a.getLong(6) == 750000L, "affected_ppm = 3/4")
    val b = out("srcB")
    assert(b.getLong(2) == 0L && b.getLong(3) == 0L && b.getLong(6) == 0L,
      "clean source stays clean")
  }
}
