package graft.sources.v2

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

/** The commit lock's LEASE + FENCING protocol (pure filesystem — no
  * SparkSession needed): a dead writer's expired lock is taken over
  * without an operator, a stale holder's late marker write is fenced
  * off, and the debris of a torn (or fenced) commit is purged on the
  * next lock acquisition instead of resurrecting under a later marker.
  */
class KvLeaseSpec extends AnyFunSuite {

  private def tmp(): Path = Files.createTempDirectory("kv_lease_")

  private def writeLock(root: Path, holder: String, deadlineMs: Long,
      fence: Long): Unit =
    Files.write(root.resolve("_commit.lock"),
      (s"""{"holder": "$holder", "nonce": 1, """ +
        s""""deadlineMs": $deadlineMs, "fence": $fence}""")
        .getBytes(StandardCharsets.UTF_8))

  test("an expired lease is taken over without manual intervention") {
    val root = tmp()
    writeLock(root, "dead-writer", System.currentTimeMillis() - 60000L,
      fence = 3L)
    // no Files.delete by any operator — the takeover is automatic,
    // and the new fence is strictly above the dead holder's
    val fence = KvCommitter.withCommitLock(root, "recovering") { t =>
      t.fence
    }
    assert(fence > 3L, s"takeover fence must exceed the expired holder's, got $fence")
    assert(!Files.exists(root.resolve("_commit.lock")),
      "the recovering writer must release its own lock")
  }

  test("a live (unexpired) lease still fails a second writer loudly") {
    val root = tmp()
    writeLock(root, "busy-writer", System.currentTimeMillis() + 60000L,
      fence = 1L)
    val e = intercept[IllegalStateException](
      KvCommitter.withCommitLock(root, "impatient") { _ => () })
    assert(e.getMessage.contains("concurrent commit") &&
      e.getMessage.contains("busy-writer"), e.getMessage)
    // the held lock is untouched
    assert(Files.exists(root.resolve("_commit.lock")))
  }

  test("a fenced stale holder dies BEFORE its marker write; the usurper's lock survives") {
    val root = tmp()
    // the slow writer acquires with an already-expired lease (simulating
    // a long GC pause / network partition past the deadline)
    val e = intercept[IllegalStateException] {
      KvCommitter.withCommitLock(root, "slow-writer", leaseMs = -60000L) { mine =>
        // meanwhile a second writer observes the expired lease, takes
        // over, commits, and releases — entirely inside our window
        val usurperFence = KvCommitter.withCommitLock(root, "usurper") { t =>
          KvCommitter.assertHeld(root, t) // the usurper IS the holder
          t.fence
        }
        assert(usurperFence > mine.fence,
          s"usurper fence ${usurperFence} must exceed stale ${mine.fence}")
        // the stale holder now reaches its marker write → must be fenced
        KvCommitter.assertHeld(root, mine)
        fail("stale holder must not pass the fencing check")
      }
    }
    assert(e.getMessage.contains("FENCED"), e.getMessage)
  }

  test("torn-commit orphans past the last marker are purged on the next acquisition") {
    val root = tmp()
    val b0 = root.resolve("bucket=0")
    Files.createDirectories(b0)
    // committed seq 0
    Files.write(b0.resolve("log-0-0.jsonl"),
      """{"op": "I", "id": 1, "name": "a", "value": 1.0}
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    Files.write(root.resolve("commit-0.json"),
      """{"seq": 0, "ops": 1, "query": "seed"}"""
        .getBytes(StandardCharsets.UTF_8))
    // debris of a commit that crashed after the move, before the marker
    Files.write(b0.resolve("log-1-0.jsonl"),
      """{"op": "D", "id": 1, "name": null, "value": null}
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    KvCommitter.withCommitLock(root, "next-writer") { _ => () }
    assert(Files.exists(b0.resolve("log-0-0.jsonl")),
      "committed logs must survive the purge")
    assert(!Files.exists(b0.resolve("log-1-0.jsonl")),
      "uncommitted orphans must be purged before the seq is reused")
  }

  test("a zombie data file at a COMMITTED sequence with a stale fence is invisible and purged") {
    val root = tmp()
    val b0 = root.resolve("bucket=0")
    Files.createDirectories(b0)
    // the takeover writer committed seq 0 under fence 5
    Files.write(b0.resolve("log-0-5-0.jsonl"),
      """{"op": "I", "id": 1, "name": "good", "value": 1.0}
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    Files.write(root.resolve("commit-0.json"),
      """{"seq": 0, "ops": 1, "query": "seed", "fence": 5}"""
        .getBytes(StandardCharsets.UTF_8))
    // a zombie writer (fenced at fence 3) moved its file AFTER the
    // usurper's purge — it lands at the same, now-committed sequence
    Files.write(b0.resolve("log-0-3-1.jsonl"),
      """{"op": "D", "id": 1, "name": null, "value": null}
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    // readers apply only the marker-matching fence
    val applied = KvTable.bucketLogs(root, 0).map(_.getFileName.toString)
    assert(applied == Seq("log-0-5-0.jsonl"),
      s"fence-mismatched file must be invisible, applied: $applied")
    // and the next lock acquisition reclaims the zombie file
    KvCommitter.withCommitLock(root, "next-writer") { _ => () }
    assert(!Files.exists(b0.resolve("log-0-3-1.jsonl")),
      "fence-mismatched debris must be purged")
    assert(Files.exists(b0.resolve("log-0-5-0.jsonl")),
      "the committed fence's file must survive")
  }

  test("fence tokens are monotone across acquisitions (persisted high-water)") {
    val root = tmp()
    val f1 = KvCommitter.withCommitLock(root, "w1") { t => t.fence }
    val f2 = KvCommitter.withCommitLock(root, "w2") { t => t.fence }
    assert(f2 > f1)
  }
}
