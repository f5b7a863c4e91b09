package graft

/** Pins the driver contract itself: every registered query has an oracle
  * (a query missing from oracleSql would silently skip the driver's
  * correctness gate), names follow the qNN_ convention the artifacts sort
  * by, and the flagship entry returns rows.
  */
class SparkEntrySpec extends SparkSpec {

  test("every registered query is oracled, and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q.diff(o).isEmpty, s"queries without an oracle: ${q.diff(o)}")
    assert(o.diff(q).isEmpty, s"oracles without a query: ${o.diff(q)}")
  }

  test("query names follow the qNN_slug convention with unique numbers") {
    val names = SparkEntry.queries.keySet
    assert(names.forall(_.matches("q\\d{2,3}_[a-z0-9_]+")), "bad name shape")
    val nums = names.map(_.takeWhile(_ != '_'))
    assert(nums.size == names.size, "duplicate query numbers")
  }

  test("flagship entry returns rows on the smallest fixture") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
