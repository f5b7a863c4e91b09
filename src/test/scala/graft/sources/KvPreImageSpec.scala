package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Changelog pre-images (the Delta-CDF shape): the committer stamps
  * every U/D record with the row it displaces, and
  * `option("preImages", true)` surfaces them as
  * (pre_name, pre_value, pre_present) — the columns an incremental
  * view maintainer needs to DECREMENT an update's old group and
  * subtract a delete. Without the option the classic five-column
  * changelog is byte-identical to before.
  */
class KvPreImageSpec extends SparkSpec {
  import spark.implicits._

  private val Cat = "kv_pre"
  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("kv_pre_").toString
    spark.conf.set(s"spark.sql.catalog.$Cat",
      classOf[graft.sources.v2.KvCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$Cat.root", r)
    spark.conf.set(s"spark.sql.catalog.$Cat.buckets", "4")
    r
  }

  private def seed(table: String, rows: Seq[(Long, String, Double)]): Unit = {
    val r = root
    spark.sql(s"CREATE TABLE IF NOT EXISTS $Cat.$table " +
      "(id BIGINT, name STRING, value DOUBLE)")
    rows.toDF("id", "name", "value").write.format("graft-kv")
      .option("path", s"$root/$table").option("buckets", 4)
      .mode("overwrite").save()
  }

  private def clog(table: String, pre: Boolean) =
    spark.read.format("graft-kv").option("path", s"$root/$table")
      .option("changelog", "true").option("preImages", pre.toString).load()

  test("UPDATE and DELETE records carry the displaced row; inserts and " +
    "the classic read are untouched") {
    seed("p1", Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))
    spark.sql(s"UPDATE $Cat.p1 SET name = 'B', value = 22.0 WHERE id = 2")
    spark.sql(s"DELETE FROM $Cat.p1 WHERE id = 3")

    val rows = clog("p1", pre = true)
      .select("op", "id", "name", "value", "pre_name", "pre_value",
        "pre_present")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.getString(2)), Option(r.get(3)),
        Option(r.getString(4)), Option(r.get(5)), r.getBoolean(6))).toSet
    // seed inserts displace nothing
    assert(rows.count(_._1 == "I") == 3 &&
      rows.filter(_._1 == "I").forall(t => t._5.isEmpty && !t._7))
    // U: new values in the record, old row in the pre-image
    assert(rows.contains(("U", 2L, Some("B"), Some(22.0),
      Some("b"), Some(20.0), true)))
    // D: record carries nulls, the pre-image carries the deleted row
    assert(rows.contains(("D", 3L, None, None,
      Some("c"), Some(30.0), true)))
    // classic read: schema exactly the five base columns, no pre
    assert(clog("p1", pre = false).schema.fieldNames.toSeq ==
      Seq("seq", "op", "id", "name", "value"))
    // and the fold is untouched by enrichment
    assert(spark.table(s"$Cat.p1").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet ==
      Set((1L, "a", 10.0), (2L, "B", 22.0)))
  }

  test("a MERGE's mixed I/U/D commit enriches only the U and D rows") {
    seed("p2", Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
    Seq((2L, "B", 20.0), (3L, "x", -1.0), (9L, "i", 9.0))
      .toDF("id", "name", "value").createOrReplaceTempView("pre_src")
    spark.sql(
      s"""MERGE INTO $Cat.p2 t USING pre_src s ON t.id = s.id
         |WHEN MATCHED AND s.value < 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET name = s.name, value = s.value
         |WHEN NOT MATCHED THEN INSERT (id, name, value)
         |  VALUES (s.id, s.name, s.value)""".stripMargin)
    val last = graft.sources.v2.KvTable
      .committedSeqs(Paths.get(s"$root/p2")).last
    val batch = clog("p2", pre = true)
      .filter($"seq" === last)
      .select("op", "id", "pre_name", "pre_value", "pre_present")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.getString(2)), Option(r.get(3)), r.getBoolean(4))).toSet
    assert(batch == Set(
      ("U", 2L, Some("b"), Some(2.0), true),
      ("D", 3L, Some("c"), Some(3.0), true),
      ("I", 9L, None, None, false)))
  }

  test("replaying signed pre-image contributions reproduces the head " +
    "aggregate — the incremental-view-maintenance law") {
    seed("p3", (1L to 40L).map(i =>
      (i, if (i % 2 == 0) "even" else "odd", i.toDouble)))
    spark.sql(s"UPDATE $Cat.p3 SET value = value * 10 WHERE id % 5 = 0")
    // a dim-moving update: rows change GROUP, so the old group must be
    // decremented and the new one incremented
    spark.sql(s"UPDATE $Cat.p3 SET name = 'moved' WHERE id % 7 = 0")
    spark.sql(s"DELETE FROM $Cat.p3 WHERE id % 11 = 0")
    import org.apache.spark.sql.functions._
    val contrib = clog("p3", pre = true).select(
      explode(when(col("op") === "I",
          array(struct(col("name"), col("value").as("v"), lit(1L).as("c"))))
        .when(col("op") === "D",
          array(struct(col("pre_name").as("name"),
            (-col("pre_value")).as("v"), lit(-1L).as("c"))))
        .otherwise( // U: increment the new group, decrement the old
          array(struct(col("name"), col("value").as("v"), lit(1L).as("c")),
            struct(col("pre_name").as("name"),
              (-col("pre_value")).as("v"), lit(-1L).as("c"))))).as("x"))
      .select(col("x.name"), col("x.v"), col("x.c"))
      .groupBy("name").agg(sum("v").as("sv"), sum("c").as("sc"))
      .filter(col("sc") > 0)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2))))
      .toMap
    val direct = spark.table(s"$Cat.p3")
      .groupBy("name").agg(sum("value").as("sv"), count(lit(1)).as("sc"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2))))
      .toMap
    assert(contrib == direct, s"IVM replay $contrib vs direct $direct")
  }

  test("RESTORE's replay records predate pre-image capture per their " +
    "semantics: its D rows surface pre_present=false, so a decrement " +
    "consumer refuses them (snapshot reset, like compaction)") {
    seed("p4", Seq((1L, "a", 1.0), (2L, "b", 2.0)))
    Seq((3L, "c", 3.0)).toDF("id", "name", "value")
      .write.format("graft-kv").option("path", s"$root/p4")
      .mode("append").save()
    graft.sources.v2.KvTable.restore(spark, s"$root/p4", 0L, 4)
    val last = graft.sources.v2.KvTable
      .committedSeqs(Paths.get(s"$root/p4")).last
    val restoreRows = clog("p4", pre = true).filter($"seq" === last)
      .select("op", "id", "pre_present")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(restoreRows.exists(t => t._1 == "D" && t._2 == 3L && !t._3),
      s"restore D must NOT fabricate a pre-image: ${restoreRows.toSeq}")
  }

  test("within one commit, an I followed by a U of the same key sees " +
    "the I as its pre-image (reader apply order)") {
    val dir = Files.createTempDirectory("kv_pre_unit_").toString
    Files.createDirectories(Paths.get(dir))
    val state = scala.collection.mutable.Map
      .empty[Long, (Option[String], Option[Double])]
    val out = graft.sources.v2.KvCommitter.enrichPreImages(Seq(
      """{"op": "I", "id": 7, "name": "n0", "value": 1.5}""",
      """{"op": "U", "id": 7, "name": "n1", "value": 2.5}""",
      """{"op": "D", "id": 7, "name": null, "value": null}"""),
      state, Paths.get(dir), 0)
    val lines = out.split('\n')
    assert(!lines(0).contains("\"pre\""))
    assert(lines(1).contains(""""pre": {"name": "n0", "value": 1.5}"""))
    assert(lines(2).contains(""""pre": {"name": "n1", "value": 2.5}"""))
    assert(state.isEmpty) // the D removed the key
    // a U/D for a key the fold does not hold aborts loudly
    val e = intercept[IllegalStateException](
      graft.sources.v2.KvCommitter.enrichPreImages(
        Seq("""{"op": "D", "id": 99, "name": null, "value": null}"""),
        state, Paths.get(dir), 0))
    assert(e.getMessage.contains("absent key"))
  }
}
