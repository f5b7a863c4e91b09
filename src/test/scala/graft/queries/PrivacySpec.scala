package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private def scrub(texts: String*): Seq[String] =
    texts.toDF("t")
      .select(Privacy.maskLongDigitRuns(Privacy.redactEmails(col("t"))).as("r"))
      .as[String].collect().toSeq

  test("emails are redacted, including dotted/plus-tagged locals") {
    assert(scrub("mail a.b+tag@sub.example.co and x@y.io.") ==
      Seq("mail [EMAIL] and [EMAIL]."))
  }

  test("digit runs of >= 9 keep only the last four; <= 8 untouched") {
    assert(scrub("card 1234567890 year 2026 id 12345678") ==
      Seq("card ***7890 year 2026 id 12345678"))
  }

  test("email local part made of digits is consumed by the email pass first") {
    assert(scrub("123456789@bank.example.com ref 987654321") ==
      Seq("[EMAIL] ref ***4321"))
  }

  test("text without PII passes through unchanged") {
    val t = "Customer meeting notes: discuss Q3 targets (7 items)."
    assert(scrub(t) == Seq(t))
  }

  test("q64 fixture: every row fully scrubbed, counts match the synthesis rule") {
    val rows = Privacy.q64PiiRedact(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (key, nEmails, nIds, red) =>
      assert(nEmails == (if (key % 3 == 0) 0L else 1L), s"key $key email count")
      // account number + the 9-digit run inside Customer#NNNNNNNNN
      assert(nIds == 2L, s"key $key id count")
      assert(!red.contains("@"), s"key $key leaked an email: $red")
      assert(!"[0-9]{9,}".r.findFirstIn(red).isDefined, s"key $key leaked digits: $red")
    }
  }

  test("q187 forget plan equals literal per-table counts with the " +
    "lineitem cascade") {
    val d0 = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, d0).select($"user_id")
      .as[Long].collect().toSeq
    val cu = graft.Tables.customer(spark, d0).select($"c_custkey")
      .as[Long].collect().toSeq
    val or0 = graft.Tables.orders(spark, d0).select($"o_orderkey", $"o_custkey")
      .as[(Long, Long)].collect().toSeq
    val purgeOrders = or0.filter(_._2 % 97 == 0).map(_._1).toSet
    val li = graft.Tables.lineitem(spark, d0).select($"l_orderkey")
      .as[Long].collect().toSeq
    val expected = Seq(
      ("customer", cu.count(_ % 97 == 0).toLong, cu.size.toLong),
      ("events", ev.count(_ % 97 == 0).toLong, ev.size.toLong),
      ("lineitem", li.count(purgeOrders).toLong, li.size.toLong),
      ("orders", or0.count(_._2 % 97 == 0).toLong, or0.size.toLong)
    ).map { case (t, p0, n) => (t, p0, n, p0 * 1000000L / n) }
    val got = Privacy.q187ForgetPlan(spark, d0)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // the cascade matters: lineitem purge exceeds what a naive
    // user-column scan would find (lineitem has no user column at all)
    assert(got.find(_._1 == "lineitem").exists(_._2 > 0))
  }
}
