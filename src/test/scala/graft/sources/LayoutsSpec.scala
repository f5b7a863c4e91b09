package graft.sources

import org.apache.hadoop.fs.Path

import graft.SparkSpec

class LayoutsSpec extends SparkSpec {

  private def fs = new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def freshRoot(): Path = {
    val p = new Path(java.nio.file.Files.createTempDirectory("graft_pub_").toString)
    fs.mkdirs(p); p
  }

  private def writeLayout(dir: Path, marker: String, complete: Boolean): Unit = {
    fs.mkdirs(dir)
    val out = fs.create(new Path(dir, marker)); out.close()
    if (complete) { val s = fs.create(new Path(dir, "_SUCCESS")); s.close() }
  }

  test("a complete layout is reused without invoking the builder") {
    val root = freshRoot()
    writeLayout(new Path(root, "t"), "original", complete = true)
    var built = false
    val loc = Layouts.publish(spark, root, "t") { _ => built = true }
    assert(!built, "builder must not run when a complete layout exists")
    assert(fs.exists(new Path(loc, "original")))
  }

  test("a stale dir (no _SUCCESS) is replaced and the builder's output published") {
    val root = freshRoot()
    writeLayout(new Path(root, "t"), "stale", complete = false)
    val loc = Layouts.publish(spark, root, "t") { tmp =>
      writeLayout(tmp, "fresh", complete = true)
    }
    assert(fs.exists(new Path(loc, "fresh")) && fs.exists(new Path(loc, "_SUCCESS")))
    assert(!fs.exists(new Path(loc, "stale")), "stale content must be gone")
    // the aside copy is reclaimed — nothing but the published dir remains
    val leftovers = fs.listStatus(root).map(_.getPath.getName).filterNot(_ == "t")
    assert(leftovers.isEmpty, s"unexpected leftovers: ${leftovers.toSeq}")
  }

  test("a published layout is never rebuilt or destroyed by a second publisher") {
    // The reuse-not-destroy invariant from the caller's side. (The
    // narrow mid-protocol window — dir turns complete between the
    // staleness re-check and the aside rename — cannot be triggered
    // deterministically without a filesystem hook; its recovery branch
    // renames a complete aside straight back and is kept directly next
    // to the race it handles in Layouts.publish.)
    val root = freshRoot()
    writeLayout(new Path(root, "t"), "victim", complete = true)
    var built = false
    val out = Layouts.publish(spark, root, "t") { _ => built = true }
    assert(!built && fs.exists(new Path(out, "victim")))
  }

  test("the protocol owns its marker when the committer's is disabled") {
    // marksuccessfuljobs=false (object-store tuning) leaves build output
    // unmarked; publish self-marks before the rename, because build()
    // throwing is the completeness signal in that configuration
    val conf = spark.sparkContext.hadoopConfiguration
    val key = "mapreduce.fileoutputcommitter.marksuccessfuljobs"
    conf.setBoolean(key, false)
    try {
      val root = freshRoot()
      val loc = Layouts.publish(spark, root, "t") { tmp =>
        writeLayout(tmp, "unmarked", complete = false)
      }
      assert(fs.exists(new Path(loc, "unmarked")) && fs.exists(new Path(loc, "_SUCCESS")))
    } finally conf.setBoolean(key, true)
  }

  test("with markers enabled, a build that yields no _SUCCESS fails loudly") {
    // the default configuration: a missing marker means no write job
    // completed — publishing would cache a truncated layout forever
    val root = freshRoot()
    val e = intercept[IllegalArgumentException] {
      Layouts.publish(spark, root, "t") { tmp =>
        writeLayout(tmp, "incomplete", complete = false)
      }
    }
    assert(e.getMessage.contains("_SUCCESS"), e.getMessage)
  }

  test("a non-protocol writer squatting on the published path fails loudly") {
    // the post-build completeness check (round-7 advice): a FOREIGN
    // incomplete dir at the published path must never be RETURNED as
    // complete — simulate a legacy writer racing in mid-publish
    val root = freshRoot()
    val e = intercept[IllegalArgumentException] {
      Layouts.publish(spark, root, "t") { tmp =>
        writeLayout(tmp, "mine", complete = true)
        // foreign incomplete dir appears at loc AFTER the stale sweep
        writeLayout(new Path(root, "t"), "foreign", complete = false)
      }
    }
    assert(e.getMessage.contains("_SUCCESS"), e.getMessage)
  }

  test("an in-place fixture regeneration invalidates the maintained layout") {
    // The round-8 hazard: the fixture is regenerated at the SAME path
    // with new bytes; a name that encodes only the path would keep
    // serving the old layout. srcTag folds (mtime, length) of the
    // fixture files into the name, so the regenerated fixture maps to a
    // fresh layout dir and the old one is simply never consulted.
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_fixture_").toString
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/t.parquet")
    val first = Layouts.split(spark, d, "t", "doc_id")
    assert(first.count() == 2)
    // regenerate in place: same path, different content (row count AND
    // byte length differ, so the token changes even at coarse mtime
    // granularity)
    Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma-regenerated"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/t.parquet")
    val second = Layouts.split(spark, d, "t", "doc_id")
    assert(second.count() == 3,
      "regenerated fixture must rebuild the layout, not serve stale bytes")
    val t1 = Layouts.srcToken(spark, d, "t")
    Seq((9L, "x")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/t.parquet")
    assert(Layouts.srcToken(spark, d, "t") != t1,
      "content token must change when the fixture bytes change")
  }

  test("sweepStale reclaims orphaned generations, never the current one") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_fixture_gc_").toString
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    def layoutDirs() = {
      val p = new Path(s"$wh/graft_layouts")
      fs.listStatus(p).map(_.getPath.getName).toSet
    }
    Seq((1L, "a")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/t.parquet")
    Layouts.split(spark, d, "t", "doc_id")
    val gen1 = layoutDirs().filter(_.contains(Layouts.tag(d)))
    // regenerate in place → a second generation appears beside the first
    Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/t.parquet")
    Layouts.split(spark, d, "t", "doc_id")
    val gen2 = layoutDirs().filter(_.contains(Layouts.tag(d)))
    assert(gen1.subsetOf(gen2) && gen2.size == gen1.size + 1,
      "both generations should coexist before the sweep")
    val swept = Layouts.sweepStale(spark, d)
    assert(swept.toSet == gen1, s"sweep must reclaim exactly gen1, got $swept")
    val after = layoutDirs().filter(_.contains(Layouts.tag(d)))
    assert(after == gen2 -- gen1, "current generation must survive the sweep")
    // the surviving layout still reads
    assert(Layouts.split(spark, d, "t", "doc_id").count() == 2)
    // idempotent: nothing left to sweep
    assert(Layouts.sweepStale(spark, d).isEmpty)
  }

  test("a failed build leaks no temp directory") {
    val root = freshRoot()
    intercept[RuntimeException] {
      Layouts.publish(spark, root, "t") { tmp =>
        writeLayout(tmp, "partial", complete = false)
        throw new RuntimeException("simulated build failure")
      }
    }
    val leftovers = fs.listStatus(root).map(_.getPath.getName)
    assert(leftovers.isEmpty, s"temp dirs must be reclaimed: ${leftovers.toSeq}")
  }
}
