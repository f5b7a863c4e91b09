package graft

import org.scalatest.funsuite.AnyFunSuite

/** The oracle type-lint against deliberately broken fixtures (the q160
  * incident class must be CAUGHT) and against the real registered
  * surface (which must be CLEAN — this is the assertion that keeps the
  * defense standing as new oracles land).
  */
class OracleLintSpec extends AnyFunSuite {

  test("bare SUM in the final select is caught") {
    val v = OracleLint.lint("fix", "SELECT sum(x) AS s FROM t")
    assert(v.size == 1 && v.head.contains("widened aggregate"))
  }

  test("un-CAST window SUM is caught") {
    val v = OracleLint.lint("fix",
      "SELECT k, sum(x) OVER (PARTITION BY k) AS s FROM t")
    assert(v.nonEmpty, "window SUM widens to HUGEINT in DuckDB")
  }

  test("HUGEINT smuggled through a CTE alias is caught") {
    val v = OracleLint.lint("fix",
      "WITH a AS (SELECT sum(x) AS s FROM t) SELECT s FROM a")
    assert(v.size == 1 && v.head.contains("alias 's'"))
  }

  test("terminal CAST to HUGEINT is still a violation") {
    val v = OracleLint.lint("fix",
      "SELECT CAST(sum(x) AS HUGEINT) AS s FROM t")
    assert(v.nonEmpty)
  }

  test("the conventional stable shapes all pass") {
    val ok = Seq(
      "SELECT CAST(sum(x) AS BIGINT) AS s FROM t",
      "SELECT coalesce(CAST(sum(x) AS BIGINT), 0) AS s FROM t",
      "SELECT round(CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE), 2) AS s FROM t",
      "SELECT CAST(sum(x) AS BIGINT) > 256 AS flag FROM t",
      "SELECT sum(x) / nullif(0, 0) AS always_null FROM t",
      "SELECT CAST(sum(x) AS DOUBLE) / (10.0 * count(*)) AS score FROM t",
      "SELECT count(*) AS n, k FROM t GROUP BY k",
      // a CAST inside the CTE makes the alias clean for pass-through
      "WITH a AS (SELECT CAST(sum(x) AS BIGINT) AS s FROM t) SELECT s FROM a")
    ok.foreach { sql =>
      assert(OracleLint.lint("fix", sql).isEmpty, sql)
    }
  }

  test("a cleanly-aliased CTE aggregate re-cast at the top passes") {
    val sql =
      """WITH g AS (SELECT k, sum(x) AS s FROM t GROUP BY k)
        |SELECT k, CAST(s AS BIGINT) AS s FROM g ORDER BY k""".stripMargin
    assert(OracleLint.lint("fix", sql).isEmpty)
  }

  test("UNION ALL branches are each checked") {
    val sql =
      """SELECT sum(x) AS s FROM t
        |UNION ALL
        |SELECT CAST(sum(y) AS BIGINT) AS s FROM u""".stripMargin
    assert(OracleLint.lint("fix", sql).size == 1)
  }

  test("the full registered oracle surface is lint-clean") {
    val v = OracleLint.lintAll(SparkEntry.oracleSql)
    assert(v.isEmpty, v.mkString("\n"))
  }
}
