package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.SparkSpec

/** Unit semantics of the cleaning kernel (SURVEY §2.6 F1–F9), incl. the
  * Python-parity edges the round-2 verdict flagged as untested.
  */
class CleaningSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, input: (String, String)*): Seq[Any] =
    input.toSeq.toDF("s", "ignore").select(c).collect().map(_.get(0)).toSeq

  // --- F1: pythonTitle / normTitle (str.title() parity) -------------------

  test("pythonTitle capitalizes after any non-letter, like str.title()") {
    val df = Seq("upper-deck", "they're", "lower bowl", "4-not specified",
      "a  b", "", "ALL CAPS", "o'neill 2nd").toDF("s")
    val out = df.select(Cleaning.pythonTitle($"s")).as[String].collect().toSeq
    // Expected values are CPython str.title() outputs.
    assert(out == Seq("Upper-Deck", "They'Re", "Lower Bowl", "4-Not Specified",
      "A  B", "", "All Caps", "O'Neill 2Nd"))
  }

  test("normTitle trims, collapses inner whitespace, then title-cases") {
    val df = Seq("  lower   bowl ", "\tupper\t\tdeck").toDF("s")
    val out = df.select(Cleaning.normTitle($"s")).as[String].collect().toSeq
    assert(out == Seq("Lower Bowl", "Upper Deck"))
  }

  // --- F2: slugify ---------------------------------------------------------

  test("slugify lowers, collapses non-alnum runs, strips edge underscores") {
    val df = Seq(("PWHL Toronto!", "Coca-Cola Coliseum")).toDF("a", "b")
    val out = df.select(Cleaning.slugify($"a", $"b")).as[String].head()
    assert(out == "pwhl_toronto_coca_cola_coliseum")
  }

  test("slugify is idempotent on its own output") {
    val df = Seq(("PWHL Toronto!", "Coca-Cola Coliseum")).toDF("a", "b")
    val once = df.select(Cleaning.slugify($"a", $"b").as("s"))
    val twice = once.select(Cleaning.slugify($"s")).as[String].head()
    assert(twice == once.as[String].head())
  }

  // --- F4: multi-format date parse, coerce-to-null -------------------------

  test("parseDateMulti handles ISO, M/d/yyyy, M-d-yyyy; garbage to null") {
    val df = Seq("2025-01-07", "1/7/2025", "12/31/2025", "1-7-2025",
      "not a date", "2025-13-40").toDF("s")
    val out = df.select(Cleaning.parseDateMulti($"s").cast("string")).collect().map(_.get(0))
    assert(out.toSeq == Seq("2025-01-07", "2025-01-07", "2025-12-31", "2025-01-07", null, null))
  }

  // --- F7: numeric coercion ------------------------------------------------

  test("coerceDouble: trims, parses, nulls on garbage") {
    val df = Seq("  12.5 ", "1e3", "abc", "", "-0.25").toDF("s")
    val out = df.select(Cleaning.coerceDouble($"s")).collect().map(_.get(0))
    assert(out.toSeq == Seq(12.5, 1000.0, null, null, -0.25))
  }

  test("coerceLong: exact above 2^53, integral-valued decimals ok, fractional to null") {
    // 9007199254740993 = 2^53 + 1 — not representable in double; the direct
    // long parse must preserve it exactly.
    val df = Seq("9007199254740993", "42", " 7 ", "2.0", "1.5", "abc").toDF("s")
    val out = df.select(Cleaning.coerceLong($"s")).collect().map(_.get(0))
    assert(out.toSeq == Seq(9007199254740993L, 42L, 7L, 2L, null, null))
  }

  // --- F9: banker's rounding ----------------------------------------------

  test("broundAll applies half-even rounding (pandas round parity)") {
    val df = Seq(0.125, 0.135, 2.5, 3.5, -2.5).toDF("x")
    val out = Cleaning.broundAll(df, 2, Seq("x")).as[Double].collect().toSeq
    assert(out == Seq(0.12, 0.14, 2.5, 3.5, -2.5))
    val out0 = Cleaning.broundAll(df.select(bround($"x", 0).as("x")), 0, Seq("x"))
      .as[Double].collect().toSeq
    assert(out0 == Seq(0.0, 0.0, 2.0, 4.0, -2.0))
  }

  // --- P1/P3/P6 ------------------------------------------------------------

  test("normalizeColumns trims, lowers, maps single spaces to underscores") {
    val df = Seq((1, 2, 3)).toDF(" Event Date ", "Market", "a  b")
    // literal replace(" ","_") per reference: "a  b" -> "a__b"
    assert(Cleaning.normalizeColumns(df).columns.toSeq == Seq("event_date", "market", "a__b"))
  }

  test("withMissingAsNull adds only absent columns, typed") {
    val df = Seq(("x", 1)).toDF("market", "n")
    val out = Cleaning.withMissingAsNull(df, Seq("market" -> "string", "country" -> "string"))
    assert(out.columns.toSeq == Seq("market", "n", "country"))
    assert(out.schema("country").dataType.typeName == "string")
    assert(out.select("country").head() == Row(null))
  }

  test("flag maps predicate to 0/1 long") {
    val df = Seq(7.9, 8.0, 8.1).toDF("w")
    val out = df.select(Cleaning.flag($"w" >= 8.0)).collect().map(_.getLong(0))
    assert(out.toSeq == Seq(0L, 1L, 1L))
  }
}
