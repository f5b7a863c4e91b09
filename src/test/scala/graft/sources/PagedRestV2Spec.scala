package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

import graft.SparkSpec
import graft.sources.v2.{PagedRestPartition, PagedRestScan, PagedRestV2}

/** The paginated-REST DSv2 connector: envelope-probe planning, page
  * packing, limit pushdown, column pruning, and per-page failure
  * isolation — all against fixture pages carrying the exact envelope a
  * paged API returns.
  */
class PagedRestV2Spec extends SparkSpec {

  /** Write `total` items at `pageSize` per page; returns the dir.
    * Item i is (id=i, name="n<i>", value=i/2.0). */
  private def writePages(total: Int, pageSize: Int,
      corrupt: Set[Int] = Set.empty): String = {
    val dir = Files.createTempDirectory("graft_rest_").toString
    val nPages = math.max(1, (total + pageSize - 1) / pageSize)
    (0 until nPages).foreach { pg =>
      val body =
        if (corrupt(pg)) "{ this is not json"
        else {
          val items = (pg * pageSize until math.min(total, (pg + 1) * pageSize))
            .map(i => s"""{"id": $i, "name": "n$i", "value": ${i / 2.0}}""")
            .mkString("[", ", ", "]")
          s"""{"total": $total, "page_size": $pageSize, "items": $items}"""
        }
      Files.write(Paths.get(s"$dir/page-$pg.json"),
        body.getBytes("UTF-8"))
    }
    dir
  }

  private def read(dir: String, opts: (String, String)*) = {
    val r = spark.read.format("graft-rest").option("pages", dir)
    opts.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load()
  }

  test("full collection parity: every item of every page, with provenance") {
    val df = read(writePages(total = 23, pageSize = 5))
    import spark.implicits._
    val got = df.as[(Long, String, Double, Int)].collect().toSet
    val want = (0 until 23).map(i => (i.toLong, s"n$i", i / 2.0, i / 5)).toSet
    assert(got == want)
  }

  test("planning packs pages into pagesPerPartition-sized partitions") {
    val dir = writePages(total = 23, pageSize = 5) // 5 pages
    def plan(ppp: Int, limit: Option[Int]) =
      new PagedRestScan(dir, ppp, strict = true, PagedRestV2.Schema, limit,
          graft.sources.v2.PageBounds(), None)
        .planInputPartitions().map(_.asInstanceOf[PagedRestPartition])
    val p2 = plan(2, None)
    assert(p2.map(p => (p.firstPage, p.lastPage)).toSeq ==
      Seq((0L, 1L), (2L, 3L), (4L, 4L)))
    assert(plan(8, None).length == 1)
  }

  test("limit pushdown plans only the needed page prefix") {
    val dir = writePages(total = 23, pageSize = 5)
    def pages(limit: Int) =
      new PagedRestScan(dir, 1, strict = true, PagedRestV2.Schema, Some(limit),
          graft.sources.v2.PageBounds(), None)
        .planInputPartitions().length
    assert(pages(7) == 2, "limit 7 at page_size 5 needs 2 pages")
    assert(pages(5) == 1)
    assert(pages(1) == 1)
    assert(pages(1000) == 5, "limit beyond the collection plans all pages")
    // end-to-end: Spark still trims to exactly n rows
    assert(read(dir).limit(7).collect().length == 7)
  }

  test("column pruning reaches the reader") {
    val df = read(writePages(total = 6, pageSize = 3)).select("name", "page")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.get
    assert(scan.schema.fieldNames.toSet == Set("name", "page"),
      s"reader should materialize only the projection, got ${scan.schema}")
    assert(df.collect().length == 6)
  }

  test("a corrupt page is isolated (non-strict) or fatal (strict)") {
    val dir = writePages(total = 23, pageSize = 5, corrupt = Set(2))
    val got = read(dir).collect()
    assert(got.length == 18, "pages 0,1,3,4 survive; page 2's rows drop")
    assert(!got.map(_.getInt(3)).contains(2))
    intercept[org.apache.spark.SparkException](
      read(dir, "strict" -> "true").collect())
  }

  test("missing fields in an item degrade to nulls, never a crash") {
    val dir = Files.createTempDirectory("graft_rest_nulls_").toString
    Files.write(Paths.get(s"$dir/page-0.json"),
      """{"total": 2, "page_size": 5, "items": [
        |  {"id": 1, "name": "full", "value": 0.5},
        |  {"name": "no-id-or-value"}]}""".stripMargin.getBytes("UTF-8"))
    val rows = read(dir).orderBy("name").collect()
    assert(rows.length == 2)
    val partial = rows.find(_.getString(1) == "no-id-or-value").get
    assert(partial.isNullAt(0) && partial.isNullAt(2))
  }

  test("a broken page-0 envelope fails planning loudly") {
    val dir = Files.createTempDirectory("graft_rest_bad_").toString
    Files.write(Paths.get(s"$dir/page-0.json"),
      """{"items": []}""".getBytes("UTF-8"))
    val e = intercept[Exception](read(dir).collect())
    assert(e.getMessage != null)
  }

  test("an unreadable meta.json propagates — permanent non-404 errors " +
    "never silently re-plan from page-0 (round-19 ADVICE)") {
    // meta.json EXISTS but cannot be read as a file (it is a directory
    // → IOException, permanent=true, notFound=false). page-0 carries a
    // perfectly valid envelope — the old behavior would have planned
    // from it; the gate must throw instead.
    val dir = Files.createTempDirectory("graft_rest_authish_").toString
    Files.createDirectory(Paths.get(s"$dir/meta.json"))
    Files.write(Paths.get(s"$dir/page-0.json"),
      """{"total": 2, "page_size": 5, "items": [
        |  {"id": 1, "name": "a", "value": 0.5},
        |  {"id": 2, "name": "b", "value": 1.5}]}""".stripMargin
        .getBytes("UTF-8"))
    val e = intercept[java.io.IOException](PagedRestV2.probe(dir))
    assert(e.getMessage.contains("not falling back to page-0"))
    assert(e.getMessage.contains("unreadable"))
    // ABSENT meta (404/missing fixture) still falls back — the live-API
    // no-meta-endpoint shape keeps working
    val dir2 = Files.createTempDirectory("graft_rest_nometa_").toString
    Files.write(Paths.get(s"$dir2/page-0.json"),
      """{"total": 2, "page_size": 5, "items": []}""".getBytes("UTF-8"))
    assert(PagedRestV2.probe(dir2) == ((2L, 5)))
  }

  test("page predicates prune pages at planning and are claimed fully") {
    import org.apache.spark.sql.functions.col
    // meta.json carries planning; page-0 is CORRUPT and strict=true, so
    // the test passes only if the pruned scan never touches page 0
    val dir = writePages(total = 23, pageSize = 5, corrupt = Set(0))
    Files.write(Paths.get(s"$dir/meta.json"),
      """{"total": 23, "page_size": 5}""".getBytes("UTF-8"))
    val df = read(dir, "strict" -> "true")
      .filter(col("page") >= 1 && col("page") <= 2)
    assert(df.collect().map(_.getLong(0)).toSet == (5L until 15L).toSet)
    // fully claimed: no Spark-side Filter remains above the scan
    assert(df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }.isEmpty, "page predicates must not leave a residual Filter node")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.get
    assert(scan.inputRDD.getNumPartitions == 1, "pages 1-2 pack into one partition")
  }

  test("IN-set pruning plans gapped page runs") {
    import org.apache.spark.sql.functions.col
    val dir = writePages(total = 23, pageSize = 5, corrupt = Set(2))
    Files.write(Paths.get(s"$dir/meta.json"),
      """{"total": 23, "page_size": 5}""".getBytes("UTF-8"))
    val df = read(dir, "strict" -> "true", "pagesPerPartition" -> "2")
      .filter(col("page").isin(0, 1, 3))
    // corrupt page 2 is never planned; runs (0,1) and (3,3)
    assert(df.collect().map(_.getInt(3)).toSet == Set(0, 1, 3))
    // non-page predicates stay residual alongside the pruning
    val mixed = read(dir, "strict" -> "true")
      .filter(col("page").isin(0, 1, 3) && col("id") % 2 === 0)
    assert(mixed.collect().map(_.getLong(0)).forall(_ % 2 == 0))
  }

  test("count(*) is answered from the envelope, fetching zero pages") {
    import org.apache.spark.sql.functions.col
    // ONLY meta.json exists — any attempt to read a page would throw
    val dir = Files.createTempDirectory("graft_rest_meta_").toString
    Files.write(Paths.get(s"$dir/meta.json"),
      """{"total": 23, "page_size": 5}""".getBytes("UTF-8"))
    val df = read(dir, "strict" -> "true")
    assert(df.count() == 23L)
    // grouped by the pagination key: one exact row per page
    val perPage = df.groupBy("page").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perPage == Map(0 -> 5L, 1 -> 5L, 2 -> 5L, 3 -> 5L, 4 -> 3L))
    // composes with pushed page predicates: still pure envelope math
    assert(df.filter(col("page") >= 3).count() == 8L)
    // and the plan says so
    val agg = df.groupBy("page").count()
    assert(agg.queryExecution.executedPlan.toString.contains("pushedAggregate"),
      "plan should surface the pushed aggregate")
  }

  test("a pushed limit counts pages from the SELECTED range, not page 0") {
    import org.apache.spark.sql.functions.col
    val dir = writePages(total = 23, pageSize = 5)
    // pages 1.. selected; limit 7 needs pages 1-2, limit 3 needs page 1
    val base = read(dir, "strict" -> "true").filter(col("page") >= 1)
    assert(base.limit(3).collect().length == 3)
    assert(base.limit(7).collect().length == 7)
    assert(base.limit(1000).collect().map(_.getInt(3)).toSet == Set(1, 2, 3, 4))
    // IN-set variant: limit truncates the selected page list
    val gapped = read(dir, "strict" -> "true").filter(col("page").isin(0, 3))
    assert(gapped.limit(6).collect().length == 6)
  }

  test("lenient mode refuses the envelope count: count equals served rows") {
    import org.apache.spark.sql.functions.col
    val dir = writePages(total = 23, pageSize = 5, corrupt = Set(2))
    val df = read(dir) // strict = false: page 2 drops its rows
    assert(df.collect().length == 18)
    assert(df.count() == 18L,
      "non-strict count(*) must observe the isolation contract, not the envelope")
    assert(!df.groupBy("page").count().queryExecution.executedPlan.toString
      .contains("pushedAggregate"))
  }

  test("an empty collection counts to zero with zero groups") {
    val dir = Files.createTempDirectory("graft_rest_empty_").toString
    Files.write(Paths.get(s"$dir/meta.json"),
      """{"total": 0, "page_size": 5}""".getBytes("UTF-8"))
    val df = read(dir, "strict" -> "true")
    assert(df.count() == 0L)
    assert(df.groupBy("page").count().collect().isEmpty,
      "GROUP BY over zero rows must return zero groups, not a phantom page")
  }

  test("non-count aggregates fall back to the row scan") {
    import org.apache.spark.sql.functions.{col, sum}
    val dir = writePages(total = 23, pageSize = 5)
    val got = read(dir, "strict" -> "true")
      .agg(sum(col("id"))).collect()(0).getLong(0)
    assert(got == (0 until 23).sum.toLong)
  }
}
