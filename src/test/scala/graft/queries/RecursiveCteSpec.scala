package graft.queries

import graft.SparkSpec

/** q223's WITH RECURSIVE walk, hand-computed on a 7-node hierarchy:
  * Spark's UnionLoop must carry state level by level, prune finished
  * walks, and stop exactly at the first blocked ancestor or the root.
  */
class RecursiveCteSpec extends SparkSpec {
  import spark.implicits._

  test("escalation walk stops at the first blocked ancestor or the root") {
    // parent(k) = k div 2; node 3 is blocked (negative balance):
    //   1
    //   ├── 2 ── 4, 5
    //   └── 3* ── 6, 7
    Seq((1L, 10.0), (2L, 20.0), (3L, -5.0), (4L, 40.0), (5L, 50.0),
      (6L, 60.0), (7L, 70.0))
      .toDF("c_custkey", "c_acctbal")
      .createOrReplaceTempView("q223_customer")
    val rows = spark.sql(
      """WITH RECURSIVE walk(start_id, cur, steps, blocked) AS (
        |  SELECT c_custkey, c_custkey, 0, FALSE FROM q223_customer
        |  UNION ALL
        |  SELECT w.start_id, p.c_custkey, w.steps + 1, p.c_acctbal < 0
        |  FROM walk w JOIN q223_customer p ON p.c_custkey = w.cur DIV 2
        |  WHERE w.cur > 1 AND NOT w.blocked
        |)
        |SELECT start_id, steps, blocked FROM walk
        |WHERE blocked OR cur <= 1""".stripMargin)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2))))
      .toMap
    assert(rows == Map(
      1L -> ((0, false)),  // starts at the root, zero steps
      2L -> ((1, false)),  // 2 → 1
      3L -> ((1, false)),  // 3 → 1 (own balance irrelevant: ancestors only)
      4L -> ((2, false)),  // 4 → 2 → 1
      5L -> ((2, false)),  // 5 → 2 → 1
      6L -> ((1, true)),   // 6 → 3* blocked
      7L -> ((1, true))))  // 7 → 3* blocked
    // exactly one terminal row per start — finished walks are pruned
    assert(rows.size == 7)
  }
}
