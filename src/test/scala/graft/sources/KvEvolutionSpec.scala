package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** q239's ADD COLUMN schema evolution on graft-kv: null backfill on
  * pre-evolution commits, versioned schema under time travel (a
  * pre-ALTER version returns the OLD schema), compaction rewriting
  * survivors under the widened schema, truncate keeping the evolution
  * metadata, and loud refusals for every other ALTER shape.
  */
class KvEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private val Cat = "kv_evo"
  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("kv_evo_").toString
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

  private def evolve(table: String): Unit = {
    // commit 0: pre-evolution; ALTER (sinceSeq 1); commit 1: post
    seed(table, Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))
    spark.sql(s"ALTER TABLE $Cat.$table ADD COLUMN tier STRING")
    Seq((2L, "B", 200.0, "gold"), (4L, "d", 40.0, "silver"))
      .toDF("id", "name", "value", "tier")
      .createOrReplaceTempView(s"${table}_src")
    spark.sql(
      s"""MERGE INTO $Cat.$table t USING ${table}_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET name = s.name, value = s.value, tier = s.tier
         |WHEN NOT MATCHED THEN
         |  INSERT (id, name, value, tier) VALUES (s.id, s.name, s.value, s.tier)
         |""".stripMargin)
  }

  private def widened(table: String): Map[Long, (String, Double, String)] =
    spark.table(s"$Cat.$table").collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getDouble(2),
          if (r.isNullAt(3)) null else r.getString(3)))).toMap

  test("null backfill: pre-evolution rows read NULL, post-evolution rows carry values") {
    evolve("e1")
    assert(spark.table(s"$Cat.e1").columns.toSeq ==
      Seq("id", "name", "value", "tier"))
    assert(widened("e1") == Map(
      1L -> ("a", 10.0, null), 3L -> ("c", 30.0, null),
      2L -> ("B", 200.0, "gold"), 4L -> ("d", 40.0, "silver")))
  }

  test("time travel to a pre-ALTER version returns the OLD schema") {
    evolve("e2")
    val v0 = spark.sql(s"SELECT * FROM $Cat.e2 VERSION AS OF 0")
    assert(v0.columns.toSeq == Seq("id", "name", "value"),
      s"pre-evolution version must not carry tier: ${v0.columns.toSeq}")
    assert(v0.collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    // the post-ALTER version carries the widened schema
    val v1 = spark.sql(s"SELECT * FROM $Cat.e2 VERSION AS OF 1")
    assert(v1.columns.toSeq == Seq("id", "name", "value", "tier"))
  }

  test("compaction rewrites survivors under the widened schema") {
    evolve("e3")
    graft.sources.v2.KvTable.compact(spark, s"$root/e3", buckets = 4)
    assert(widened("e3") == Map(
      1L -> ("a", 10.0, null), 3L -> ("c", 30.0, null),
      2L -> ("B", 200.0, "gold"), 4L -> ("d", 40.0, "silver")),
      "state must survive compaction byte-for-byte")
    // the compacted I-records physically re-assert the evolved column
    val compacted = Files.list(Paths.get(s"$root/e3/bucket=${2 % 4}"))
    val bytes = try compacted.iterator()
      .next() // exactly one file per bucket after compaction
    finally compacted.close()
    assert(new String(Files.readAllBytes(bytes)).contains("\"ext\""),
      "compacted records must carry the ext object")
  }

  test("truncate keeps the evolution metadata") {
    evolve("e4")
    Seq((9L, "z", 9.0, "bronze")).toDF("id", "name", "value", "tier")
      .write.format("graft-kv")
      .option("path", s"$root/e4").option("buckets", 4)
      .mode("overwrite").save()
    assert(widened("e4") == Map(9L -> ("z", 9.0, "bronze")),
      "overwrite must empty the table but keep the widened schema")
  }

  test("withExt changelog carries evolved columns typed; base changelog unchanged") {
    evolve("e6")
    val base = spark.read.format("graft-kv")
      .option("path", s"$root/e6").option("buckets", 4)
      .option("changelog", true).load()
    assert(base.columns.toSeq == Seq("seq", "op", "id", "name", "value"),
      "the classic changelog must stay byte-identical (opt-in widening)")
    val ext = spark.read.format("graft-kv")
      .option("path", s"$root/e6").option("buckets", 4)
      .option("changelog", true).option("withExt", true).load()
    assert(ext.columns.toSeq == Seq("seq", "op", "id", "name", "value", "tier"))
    val rows = ext.collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(2), if (r.isNullAt(5)) null else r.getString(5)))
    // pre-evolution commit 0: tier null; post-evolution commit 1
    // carries gold/silver on its U/I records
    assert(rows.filter(_._1 == 0L).forall(_._4 == null))
    assert(rows.filter(_._1 == 1L).map(r => (r._3, r._4)).toSet ==
      Set((2L, "gold"), (4L, "silver")), rows.toSeq.mkString(","))
  }

  test("every other ALTER shape is refused loudly") {
    evolve("e5")
    def refused(sql: String, frag: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains(frag), s"$sql → $msg")
    }
    refused(s"ALTER TABLE $Cat.e5 DROP COLUMN tier", "only ADD COLUMN")
    refused(s"ALTER TABLE $Cat.e5 RENAME COLUMN tier TO t2", "only ADD COLUMN")
    refused(s"ALTER TABLE $Cat.e5 ADD COLUMN tier STRING", "already exists")
    refused(s"ALTER TABLE $Cat.e5 ADD COLUMN arr ARRAY<INT>",
      "ADD COLUMN supports BIGINT, DOUBLE, STRING")
  }
}
