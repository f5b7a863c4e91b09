package graft.pwhl

import graft.SparkSpec

/** Dictionary cross-validation against the REAL reference dictionary and
  * the raw surfaces the pipeline actually reads — including the
  * reference's own documentation drift, which the operator must surface
  * rather than smooth over.
  */
class DictionarySpec extends SparkSpec {

  private val dictPath = "/root/reference/data/reference/pwhl_data_dictionary.csv"

  private def rawSurfaces: Map[String, Seq[String]] = Map(
    "pwhl_ticket_sales_sample.csv" -> RawSchemas.ticketSales.fieldNames.toSeq,
    "game_section_capacity.csv" -> RawSchemas.sectionCapacity.fieldNames.toSeq)

  test("the reference dictionary loads as the 14-entry contract") {
    val d = Dictionary.load(spark, dictPath)
    assert(d.size == 14)
    assert(d.map(_.source).distinct.sorted == Seq(
      "game_capacity.csv", "game_section_capacity.csv",
      "pwhl_ticket_sales_sample.csv"))
    assert(d.forall(e => e.field.nonEmpty && e.description.nonEmpty))
  }

  test("cross-check reproduces the reference's own documentation drift") {
    val d = Dictionary.load(spark, dictPath)
    val audit = Dictionary.crossCheck(spark, d, rawSurfaces)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    // every ticket-sales and section-capacity field is documented + present
    assert(audit.count(_._3 == "ok") == 12)
    // game_capacity.csv is documented but the raw dataset does not ship it
    val missing = audit.filter(_._3 == "missing_in_data").toSeq
    assert(missing.map(_._1).distinct == Seq("game_capacity.csv"))
    assert(missing.map(_._2).sorted == Seq("capacity", "event_date"))
    assert(!audit.exists(_._3 == "undocumented"))
  }

  test("planted drift in either direction is flagged") {
    val d = Dictionary.load(spark, dictPath)
    val drifted = rawSurfaces
      .updated("pwhl_ticket_sales_sample.csv",
        rawSurfaces("pwhl_ticket_sales_sample.csv")
          .filterNot(_ == "seat") :+ "loyalty_tier")
    val audit = Dictionary.crossCheck(spark, d, drifted)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(audit.contains(
      ("pwhl_ticket_sales_sample.csv", "seat", "missing_in_data")))
    assert(audit.contains(
      ("pwhl_ticket_sales_sample.csv", "loyalty_tier", "undocumented")))
  }
}
