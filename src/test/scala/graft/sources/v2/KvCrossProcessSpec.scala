package graft.sources.v2

import java.nio.file.{Files, Paths}
import java.util.concurrent.TimeUnit

import scala.jdk.CollectionConverters._

import graft.SparkSpec

/** CROSS-PROCESS crash matrix (round-16 verdict item 4): the in-JVM
  * contention suite runs two committer THREADS — the lease/fence
  * protocol's real adversary is a second PROCESS that dies uncleanly,
  * with no finally blocks, its lock and half-moved files abandoned on
  * disk. Each case forks a real second JVM ([[KvCrashChild]]), pauses
  * it at a named protocol step (`graft.kv.pause.*` announces the step
  * on stdout), SIGKILLs it inside the window, and asserts:
  *
  *   - reader-visible state NEVER tears (only complete commit prefixes
  *     are ever served, before and after the takeover);
  *   - the zombie's files are fenced: after the next writer's takeover,
  *     every on-disk log file's (seq, fence) matches a committed
  *     marker — the orphans are purged, not resurrected;
  *   - the table keeps accepting writes: the dead writer blocks the
  *     lock only until its (shortened, `graft.kv.leaseMs`) lease
  *     expires, then the takeover bumps the fence and proceeds.
  *
  * Kill points: mid-COMMIT (files moved, marker unwritten), mid-
  * COMPACTION before its marker (compacted files on disk, invisible),
  * and mid-compaction AFTER the marker but before old-log retirement
  * (the documented both-visible overlap, which must fold identically).
  */
class KvCrossProcessSpec extends SparkSpec {
  import spark.implicits._

  private val LeaseMs = 8000L

  private def newTable(): String = {
    val r = Files.createTempDirectory("kv_xproc_").toString + "/t"
    Seq((0L, "seed", 0.0)).toDF("id", "name", "value")
      .write.format("graft-kv").option("path", r).option("buckets", 4)
      .mode("overwrite").save()
    r
  }

  private def append(r: String, rows: Seq[(Long, String, Double)]): Unit =
    rows.toDF("id", "name", "value").write.format("graft-kv")
      .option("path", r).mode("append").save()

  private def state(r: String): Set[(Long, String, Double)] =
    spark.read.format("graft-kv").option("path", r).load()
      .as[(Long, String, Double)].collect().toSet

  private def isLockRace(t: Throwable): Boolean =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
      .exists(c => Option(c.getMessage).exists(_.contains("concurrent commit")))

  /** Retry through the dead child's unexpired lease — the real
    * takeover path a production writer runs. */
  private def withLockRetry[T](what: String)(body: => T): T = {
    val deadline = System.currentTimeMillis() + 3 * LeaseMs + 30000
    var last: Throwable = null
    while (System.currentTimeMillis() < deadline) {
      try return body
      catch {
        case e: Exception if isLockRace(e) => last = e; Thread.sleep(250)
      }
    }
    throw new AssertionError(s"$what starved past the lease window", last)
  }

  /** Fork [[KvCrashChild]], wait for the pause announcement (or, with
    * `killAt = None`, for clean exit), SIGKILL inside the window.
    * Returns the child's stdout. */
  private def runChild(killAt: Option[String], sysProps: Map[String, String],
      args: String*): Seq[String] = {
    val jvm = Paths.get(sys.props("java.home"), "bin", "java").toString
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(jvm, "-Xmx1g") ++ addOpens ++
      Seq("-Dspark.ui.enabled=false", s"-Dgraft.kv.leaseMs=$LeaseMs") ++
      sysProps.map { case (k, v) => s"-D$k=$v" } ++
      Seq("-cp", sys.props("java.class.path"),
        "graft.sources.v2.KvCrashChild") ++ args
    val pb = new ProcessBuilder(cmd.asJava)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    val deadline = System.currentTimeMillis() + 120000
    var killed = false
    var line = reader.readLine()
    while (line != null && !killed) {
      out += line
      if (killAt.exists(p => line.contains(s"[kv-pause] $p"))) {
        proc.destroyForcibly() // SIGKILL: no shutdown hooks, no finally
        killed = true
      }
      if (System.currentTimeMillis() > deadline) {
        proc.destroyForcibly()
        throw new AssertionError(s"child overran: ${out.mkString("\n")}")
      }
      if (!killed) line = reader.readLine()
    }
    assert(proc.waitFor(30, TimeUnit.SECONDS), "child did not die")
    killAt.foreach { p =>
      assert(killed, s"child never reached pause '$p': ${out.mkString("\n")}")
    }
    out.toSeq
  }

  /** Every on-disk log file must carry a (seq, fence) some committed
    * marker recorded — i.e. zero zombie files survive the takeover. */
  private def assertNoOrphans(r: String): Unit = {
    val root = Paths.get(r)
    val fences = KvTable.markerFences(root)
    val listing = Files.list(root)
    val offenders = try listing.iterator().asScala
      .filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("bucket="))
      .flatMap { bd =>
        val logs = Files.list(bd)
        try logs.iterator().asScala.toSeq.iterator
          .map(_.getFileName.toString)
          .filter(_.startsWith("log-"))
          .filterNot { n =>
            val parts = n.stripPrefix("log-").stripSuffix(".jsonl").split("-")
            fences.get(parts(0).toLong).contains(parts(1).toLong)
          }
        finally logs.close()
      }.toSeq
    finally listing.close()
    assert(offenders.isEmpty, s"zombie log files survived: $offenders")
  }

  test("SIGKILL mid-commit (files moved, marker unwritten): the torn " +
    "commit is invisible, the lease bounds the outage, the takeover " +
    "purges the zombie's files") {
    val r = newTable()
    append(r, Seq((1L, "pre", 1.0)))
    val before = state(r)
    runChild(killAt = Some("beforeMarker"),
      sysProps = Map("graft.kv.pause.beforeMarker" -> "60000"),
      "append", r, "doomed")
    // the dead child moved log files but never wrote its marker: a
    // reader AT THIS INSTANT sees exactly the pre-crash prefix
    assert(state(r) == before, "a torn commit must never be readable")
    // its lock is still on disk with a live lease: an immediate writer
    // fails LOUDLY (serialization is the contract)...
    val e = intercept[Exception] { append(r, Seq((2L, "blocked", 2.0))) }
    assert(isLockRace(e), s"expected the concurrent-commit refusal, got $e")
    // ...and a retrying writer takes over once the lease expires
    withLockRetry("takeover append") { append(r, Seq((3L, "after", 3.0))) }
    assert(state(r) == before + ((3L, "after", 3.0)),
      "post-takeover state = pre-crash prefix + the takeover commit; " +
        "the zombie's rows must never surface")
    assertNoOrphans(r)
    // the table stays fully writable afterwards
    append(r, Seq((4L, "steady", 4.0)))
    assert(state(r).contains((4L, "steady", 4.0)))
  }

  test("SIGKILL mid-compaction before its marker: the half-compaction " +
    "is invisible and a later compaction lands cleanly") {
    val r = newTable()
    append(r, Seq((1L, "a", 1.0), (2L, "b", 2.0)))
    append(r, Seq((1L, "a2", 1.5), (3L, "c", 3.0)))
    val before = state(r)
    runChild(killAt = Some("beforeCompactMarker"),
      sysProps = Map("graft.kv.pause.beforeCompactMarker" -> "60000"),
      "compact", r, "4")
    assert(state(r) == before,
      "compacted-but-unmarked files must stay invisible")
    withLockRetry("takeover compaction") { KvTable.compact(spark, r, 4) }
    assert(state(r) == before, "compaction must never change the fold")
    assertNoOrphans(r)
    append(r, Seq((5L, "post", 5.0)))
    assert(state(r) == before + ((5L, "post", 5.0)))
  }

  test("SIGKILL mid-compaction after its marker, before retirement: the " +
    "documented both-visible overlap folds identically and is reclaimed") {
    val r = newTable()
    append(r, Seq((1L, "a", 1.0), (2L, "b", 2.0)))
    append(r, Seq((2L, "b2", 2.5)))
    val before = state(r)
    runChild(killAt = Some("beforeRetire"),
      sysProps = Map("graft.kv.pause.beforeRetire" -> "60000"),
      "compact", r, "4")
    // marker written, old logs NOT retired: compacted I-records
    // re-assert the fold, so the overlap reads identically
    assert(state(r) == before,
      "the marker+old-logs overlap must fold to the same state")
    // the next maintenance pass reclaims the superseded logs
    withLockRetry("second compaction") { KvTable.compact(spark, r, 4) }
    assert(state(r) == before)
    assertNoOrphans(r)
    append(r, Seq((6L, "post", 6.0)))
    assert(state(r) == before + ((6L, "post", 6.0)))
  }
}
