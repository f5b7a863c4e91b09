package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** The kv V2 catalog's lifecycle surface: CREATE/SHOW/DROP/ALTER/
  * RENAME through plain SQL, existence marked by `_kv`, fixed-schema
  * and no-partitioning contracts enforced at CREATE, and the versioned
  * loadTable rejecting non-numeric versions.
  */
class KvCatalogSpec extends SparkSpec {
  import spark.implicits._

  private val Cat = "kv_cat"
  private lazy val root: String = {
    val r = Files.createTempDirectory("kv_catops_").toString
    spark.conf.set(s"spark.sql.catalog.$Cat",
      classOf[graft.sources.v2.KvCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$Cat.root", r)
    spark.conf.set(s"spark.sql.catalog.$Cat.buckets", "4")
    r
  }

  test("create / list / drop / rename through SQL") {
    val r = root
    spark.sql(s"CREATE TABLE $Cat.c1 (id BIGINT, name STRING, value DOUBLE)")
    spark.sql(s"CREATE TABLE $Cat.c2 (id BIGINT, name STRING, value DOUBLE)")
    assert(Files.exists(Paths.get(s"$r/c1/_kv")))
    val listed = spark.sql(s"SHOW TABLES IN $Cat")
      .select("tableName").as[String].collect().toSet
    assert(Set("c1", "c2").subsetOf(listed))
    // duplicate create fails; IF NOT EXISTS is quiet
    intercept[Exception](
      spark.sql(s"CREATE TABLE $Cat.c1 (id BIGINT, name STRING, value DOUBLE)"))
    spark.sql(s"CREATE TABLE IF NOT EXISTS $Cat.c1 " +
      "(id BIGINT, name STRING, value DOUBLE)")
    // rename moves the directory; old name gone, data follows
    Seq((1L, "a", 1.0)).toDF("id", "name", "value").write.format("graft-kv")
      .option("path", s"$r/c1").option("buckets", 4).mode("append").save()
    spark.sql(s"ALTER TABLE $Cat.c1 RENAME TO c3")
    assert(!Files.exists(Paths.get(s"$r/c1")) &&
      Files.exists(Paths.get(s"$r/c3/_kv")))
    assert(spark.table(s"$Cat.c3").count() == 1)
    // drop removes the tree
    spark.sql(s"DROP TABLE $Cat.c3")
    assert(!Files.exists(Paths.get(s"$r/c3")))
    intercept[Exception](spark.table(s"$Cat.c3").collect())
  }

  test("contracts enforced at CREATE and load") {
    val r = root
    // kv tables carry the fixed schema
    val e1 = intercept[Exception](
      spark.sql(s"CREATE TABLE $Cat.bad1 (x INT, y STRING)"))
    assert(e1.getMessage.contains("fixed schema"), e1.getMessage)
    // and are hash-bucketed internally, never user-partitioned
    val e2 = intercept[Exception](spark.sql(
      s"CREATE TABLE $Cat.bad2 (id BIGINT, name STRING, value DOUBLE) " +
        "PARTITIONED BY (name)"))
    assert(e2.getMessage.contains("hash-bucketed"), e2.getMessage)
    // ALTER COLUMN is refused (fixed schema)
    spark.sql(s"CREATE TABLE IF NOT EXISTS $Cat.a1 " +
      "(id BIGINT, name STRING, value DOUBLE)")
    intercept[Exception](
      spark.sql(s"ALTER TABLE $Cat.a1 ADD COLUMN extra INT"))
    // VERSION AS OF wants a commit sequence number
    val e3 = intercept[Exception](
      spark.sql(s"SELECT * FROM $Cat.a1 VERSION AS OF 'not-a-seq'").collect())
    assert(e3.getMessage.contains("commit sequence"), e3.getMessage)
  }
}
