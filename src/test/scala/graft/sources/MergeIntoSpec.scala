package graft.sources

import graft.SparkSpec

/** SQL row-level commands (MERGE INTO / UPDATE / DELETE) against the
  * paged-REST connector through [[graft.sources.v2.PagedRestCatalog]] —
  * the group-based SupportsRowLevelOperations surface: Spark rewrites
  * the command into a scan + complete post-state write, and the
  * connector's atomic truncate-replace publishes it (a failed command
  * leaves the old collection intact).
  */
class MergeIntoSpec extends SparkSpec {
  import spark.implicits._

  private val Cat = "rest_mrg"
  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("rest_cat_").toString
    spark.conf.set(s"spark.sql.catalog.$Cat",
      classOf[graft.sources.v2.PagedRestCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$Cat.root", r)
    spark.conf.set(s"spark.sql.catalog.$Cat.pageSize", "3")
    r
  }

  private def seed(table: String, rows: Seq[(Long, String, Double)]): Unit =
    rows.toDF("id", "name", "value").write.format("graft-rest")
      .option("pages", s"$root/$table").option("pageSize", 3)
      .mode("overwrite").save()

  private def state(table: String): Map[Long, (String, Double)] =
    spark.table(s"$Cat.$table").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap

  test("MERGE INTO: matched-delete, matched-update, not-matched-insert") {
    seed("m1", Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0),
      (5L, "e", 50.0), (6L, "f", 60.0), (7L, "g", 70.0)))
    Seq((2L, "B", 200.0), (4L, "D", -1.0), (8L, "H", 800.0), (9L, "I", -9.0))
      .toDF("id", "name", "value").createOrReplaceTempView("m1_src")
    spark.sql(
      s"""MERGE INTO $Cat.m1 t USING m1_src s ON t.id = s.id
         |WHEN MATCHED AND s.value < 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET name = s.name, value = s.value
         |WHEN NOT MATCHED THEN
         |  INSERT (id, name, value, page) VALUES (s.id, s.name, s.value, 0)
         |""".stripMargin)
    assert(state("m1") == Map(
      1L -> ("a", 10.0), 2L -> ("B", 200.0), 3L -> ("c", 30.0),
      5L -> ("e", 50.0), 6L -> ("f", 60.0), 7L -> ("g", 70.0),
      8L -> ("H", 800.0), 9L -> ("I", -9.0)))
    // the replace re-published a dense, envelope-consistent collection:
    // 8 rows at pageSize 3 -> pages 0..2, meta total 8
    val (total, ps) = {
      val meta = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"$root/m1/meta.json")))
      (meta.path("total").asLong(), meta.path("page_size").asInt())
    }
    assert(total == 8L && ps == 3)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$root/m1/page-2.json")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$root/m1/page-3.json")))
  }

  test("DELETE FROM removes exactly the predicate's rows") {
    seed("d1", Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0),
      (4L, "d", 4.0)))
    spark.sql(s"DELETE FROM $Cat.d1 WHERE id % 2 = 0")
    assert(state("d1") == Map(1L -> ("a", 1.0), 3L -> ("c", 3.0)))
  }

  test("UPDATE rewrites matching rows and carries the rest") {
    seed("u1", Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
    spark.sql(s"UPDATE $Cat.u1 SET value = value + 0.5 WHERE id >= 2")
    assert(state("u1") == Map(
      1L -> ("a", 1.0), 2L -> ("b", 2.5), 3L -> ("c", 3.5)))
  }

  test("catalog surface: list, create empty, drop, rename, alter refused") {
    seed("c1", Seq((1L, "a", 1.0)))
    val cat = spark.sessionState.catalogManager.catalog(Cat)
      .asInstanceOf[graft.sources.v2.PagedRestCatalog]
    val ns = Array.empty[String]
    val names = cat.listTables(ns).map(_.name()).toSet
    assert(names.contains("c1"))
    spark.sql(s"CREATE TABLE $Cat.c2 (id BIGINT, name STRING, value DOUBLE, page INT)")
    assert(spark.table(s"$Cat.c2").count() == 0L)
    spark.sql(s"ALTER TABLE $Cat.c2 RENAME TO c3")
    assert(cat.listTables(ns).map(_.name()).toSet.contains("c3"))
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $Cat.c3 ADD COLUMN extra INT")
    }
    spark.sql(s"DROP TABLE $Cat.c3")
    assert(!cat.listTables(ns).map(_.name()).toSet.contains("c3"))
  }
}
