package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The graft-rest BatchWrite commit protocol: dense pagination, the
  * meta.json envelope, atomic replace, append-safety, and the
  * write→read round trip.
  */
class PagedRestWriterSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = {
    val d = Files.createTempDirectory("graft_restw_").toString
    s"$d/collection"
  }

  /** n items in table-schema order (id, name, value, page) — the write
    * schema is the table schema; page values are ignored on write. */
  private def items(n: Int, parts: Int = 3): DataFrame =
    spark.range(n).select(col("id"),
      concat(lit("n"), col("id")).as("name"),
      (col("id") / 2.0).as("value"),
      lit(0).as("page"))
      .repartition(parts)

  private def readBack(dir: String): DataFrame =
    spark.read.format("graft-rest").option("pages", dir).load()

  test("round trip: what the writer publishes, the reader returns") {
    val dir = tmp()
    items(23).write.format("graft-rest")
      .option("pages", dir).option("pageSize", 5).mode("append").save()
    val got = readBack(dir).select("id", "name", "value")
      .as[(Long, String, Double)].collect().toSet
    val want = (0 until 23).map(i => (i.toLong, s"n$i", i / 2.0)).toSet
    assert(got == want)
  }

  test("pages are dense: every page exactly pageSize items except the last") {
    val dir = tmp()
    items(23, parts = 4).write.format("graft-rest")
      .option("pages", dir).option("pageSize", 5).mode("append").save()
    val meta = new String(Files.readAllBytes(Paths.get(s"$dir/meta.json")))
    assert(meta.contains("\"total\": 23") && meta.contains("\"page_size\": 5"))
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val sizes = (0 until 5).map { p =>
      om.readTree(Files.readAllBytes(Paths.get(s"$dir/page-$p.json")))
        .path("items").size()
    }
    assert(sizes.sum == 23)
    assert(sizes.init.forall(_ == 5) && sizes.last == 3,
      s"pages must be dense, got $sizes")
    assert(!Files.exists(Paths.get(s"$dir/page-5.json")))
    // no staging/committing residue next to the collection — only the
    // collection itself and its revision ledger (the q248 DESCRIBE
    // HISTORY surface, a designed sibling artifact, not residue)
    val parent = Paths.get(dir).getParent
    val residue = Files.list(parent).iterator()
    val names = new scala.collection.mutable.ArrayBuffer[String]
    while (residue.hasNext) names += residue.next().getFileName.toString
    assert(names.toSeq.sorted ==
      Seq("collection", "collection.history.jsonl"), s"residue: $names")
  }

  test("append into a non-empty collection is refused; overwrite replaces") {
    val dir = tmp()
    items(7).write.format("graft-rest")
      .option("pages", dir).option("pageSize", 5).mode("append").save()
    val e = intercept[Exception] {
      items(3).write.format("graft-rest")
        .option("pages", dir).option("pageSize", 5).mode("append").save()
    }
    assert(e.getMessage != null)
    assert(readBack(dir).count() == 7, "failed append must not tear the collection")
    items(4).write.format("graft-rest")
      .option("pages", dir).option("pageSize", 5).mode("overwrite").save()
    assert(readBack(dir).count() == 4)
    assert(!Files.exists(Paths.get(s"$dir/page-1.json")),
      "overwrite replaces the whole collection")
  }

  test("the published collection honors the reader's limit pushdown") {
    val dir = tmp()
    items(23).write.format("graft-rest")
      .option("pages", dir).option("pageSize", 5).mode("append").save()
    assert(readBack(dir).limit(7).collect().length == 7)
  }

  test("empty input publishes an empty, readable collection") {
    val dir = tmp()
    items(23).filter(col("id") < 0).write.format("graft-rest")
      .option("pages", dir).option("pageSize", 5).mode("append").save()
    assert(readBack(dir).count() == 0)
  }

  test("non-finite doubles publish as JSON null, never invalid tokens") {
    val dir = tmp()
    Seq((1L, "a", Double.NaN), (2L, "b", Double.PositiveInfinity),
      (3L, "c", 1.5), (4L, "d", Double.NegativeInfinity))
      .toDF("id", "name", "value").withColumn("page", lit(0))
      .write.format("graft-rest")
      .option("pages", dir).option("pageSize", 2).mode("append").save()
    // every staged page must be parseable JSON — a bare NaN token would
    // fail Jackson and silently drop the page under strict=false
    assert(readBack(dir).count() == 4, "no page may be dropped")
    val got = readBack(dir).select("id", "value")
      .as[(Long, Option[Double])].collect().toMap
    assert(got == Map(1L -> None, 2L -> None, 3L -> Some(1.5), 4L -> None))
  }
}
