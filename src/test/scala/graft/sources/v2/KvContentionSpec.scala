package graft.sources.v2

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multi-writer contention, END TO END through the DataFrame writer and
  * the table scan (the unit-level lease/fence protocol is KvLeaseSpec's
  * territory): two concurrent committers serialized by the lock land
  * every commit exactly once; concurrent readers NEVER observe a torn
  * commit (every snapshot is a complete commit prefix); and a takeover
  * mid-compaction — a stalled compactor's lease expires while its
  * fence-named files are already on disk — leaves the reader-visible
  * state equal to the usurper's history, with the zombie's files
  * invisible and purged.
  */
class KvContentionSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(): String = {
    val r = Files.createTempDirectory("kv_cont_").toString + "/t"
    // seed commit fixes schema + bucket metadata
    Seq((0L, "seed", 0.0)).toDF("id", "name", "value")
      .write.format("graft-kv").option("path", r).option("buckets", 4)
      .mode("overwrite").save()
    r
  }

  private def append(r: String, rows: Seq[(Long, String, Double)]): Unit =
    rows.toDF("id", "name", "value").write.format("graft-kv")
      .option("path", r).mode("append").save()

  /** A real writer's response to losing the lock race: bounded retry.
    * The lock-race signal can arrive wrapped several layers deep
    * (SparkException → write-path wrappers → IllegalStateException), so
    * the matcher walks the WHOLE cause chain. */
  private def isLockRace(t: Throwable): Boolean =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
      .exists(c => Option(c.getMessage).exists(_.contains("concurrent commit")))

  private def appendWithRetry(r: String, rows: Seq[(Long, String, Double)]): Unit = {
    var tries = 0
    while (tries >= 0) {
      try { append(r, rows); tries = -1 }
      catch {
        case e: Exception if isLockRace(e) =>
          tries += 1
          require(tries < 600, s"writer starved after $tries lock races")
          Thread.sleep(10)
      }
    }
  }

  /** Run `body` in a thread whose failure is CAPTURED, not swallowed —
    * a dead writer thread must fail the test with its real exception. */
  private def capturing(errs: java.util.Queue[Throwable])(body: => Unit): Thread =
    new Thread(() => try body catch { case t: Throwable => errs.add(t) })

  private def ids(r: String): Set[Long] =
    spark.read.format("graft-kv").option("path", r).load()
      .select("id").as[Long].collect().toSet

  test("two concurrent committers: every commit lands exactly once, serialized by the lock") {
    val r = newTable()
    val perWriter = 6
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def writer(tag: Int): Thread = capturing(errs) {
      (0 until perWriter).foreach { i =>
        val base = (tag * 1000 + i * 10).toLong
        appendWithRetry(r, (0 until 5).map(j =>
          (base + j, s"w$tag-b$i", i.toDouble)))
      }
    }
    val (a, b) = (writer(1), writer(2))
    a.start(); b.start(); a.join(); b.join()
    assert(errs.isEmpty, s"writer thread died: ${errs.peek()}")
    val expect = (for (tag <- 1 to 2; i <- 0 until perWriter; j <- 0 until 5)
      yield (tag * 1000 + i * 10 + j).toLong).toSet + 0L
    assert(ids(r) == expect, "every batch from both writers must land")
    // the serialized history: seed + 12 appends, contiguous sequences
    val seqs = KvTable.committedSeqs(Paths.get(r))
    assert(seqs == (0L to (2L * perWriter)),
      s"commit sequences must be contiguous with no gaps or dups: $seqs")
    // no lock left behind
    assert(!Files.exists(Paths.get(r, "_commit.lock")))
  }

  test("concurrent readers never observe a torn commit (complete prefixes only)") {
    val r = newTable()
    val batch = 40
    val batches = 8
    @volatile var writerDone = false
    val violations = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val reader = capturing(errs) {
      // a second session: its own SQL conf/plan state, same cluster —
      // the closest two-driver analog one JVM offers
      val s2 = spark.newSession()
      while (!writerDone) {
        val got = s2.read.format("graft-kv").option("path", r).load()
          .select("id").collect().map(_.getLong(0)).toSet - 0L
        // every snapshot must be the union of the first k batches for
        // an integral k: batch b is ids [b*batch, b*batch+batch)
        if (got.size % batch != 0)
          violations.add(s"fractional batch visible: ${got.size} ids")
        else {
          val k = got.size / batch
          val want = (0 until k * batch).map(i => (i + 1000).toLong).toSet
          if (got != want)
            violations.add(s"non-prefix snapshot at k=$k")
        }
      }
    }
    reader.start()
    (0 until batches).foreach { b =>
      append(r, (0 until batch).map(i =>
        ((b * batch + i + 1000).toLong, s"b$b", b.toDouble)))
    }
    writerDone = true
    reader.join()
    assert(errs.isEmpty, s"reader thread died: ${errs.peek()}")
    assert(violations.isEmpty, s"torn reads observed: $violations")
    assert(ids(r).size == batches * batch + 1)
  }

  test("takeover mid-compaction: the zombie's files stay invisible; the usurper's history is the table") {
    val r = newTable()
    append(r, Seq((1L, "a", 1.0), (2L, "b", 2.0)))
    append(r, Seq((3L, "c", 3.0)))
    val root = Paths.get(r)
    val nextSeq = KvTable.committedSeqs(root).last + 1
    // a compactor stalls mid-job: lease already expired (GC pause past
    // the deadline), but its executors' fence-named compaction files
    // are ALREADY on disk at the sequence it planned to commit
    val fenced = intercept[IllegalStateException] {
      KvCommitter.withCommitLock(root, "slow-compactor", leaseMs = -60000L) { mine =>
        Files.write(root.resolve("bucket=0")
          .resolve(s"log-$nextSeq-${mine.fence}-0.jsonl"),
          """{"op": "D", "id": 1, "name": null, "value": null}
            |""".stripMargin.getBytes(StandardCharsets.UTF_8))
        // meanwhile the usurper takes over the expired lease, purges the
        // zombie's debris, and runs the REAL compaction plus an append
        KvTable.compact(spark, r, 4)
        append(r, Seq((4L, "d", 4.0)))
        // the stalled compactor wakes up and reaches its marker write
        KvCommitter.assertHeld(root, mine)
        fail("the stale compactor must be fenced before its marker write")
      }
    }
    assert(fenced.getMessage.contains("FENCED"), fenced.getMessage)
    // reader-visible state: the usurper's history, nothing torn — the
    // zombie's D-record never applied (id 1 alive)
    assert(ids(r) == Set(0L, 1L, 2L, 3L, 4L))
    // and the zombie's file is gone or fence-invisible
    val visible = KvTable.bucketLogs(root, 0).map(_.getFileName.toString)
    assert(!visible.exists(_.contains(s"log-$nextSeq-")) ||
      ids(r).contains(1L), "zombie compaction file must never apply")
  }
}
