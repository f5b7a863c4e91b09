package graft.sources.v2

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.internal.Logging
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The WRITE side of [[PagedRestV2]] — a DataSourceV2 `BatchWrite` with
  * the full two-phase commit protocol, so the connector ROUND-TRIPS:
  * `df.write.format("graft-rest")` publishes exactly the paged
  * collection `spark.read.format("graft-rest")` consumes.
  *
  * Protocol (the staged-files/atomic-publish pattern every
  * transactional file sink runs):
  *   - each task's [[DataWriter]] streams its rows into FULL pages of
  *     `pageSize` items (`task-<p>-<t>-full-<i>.json`) plus at most ONE
  *     remainder file, all under `<pages>.staging-<queryId>` —
  *     speculative/retried attempts stage under their own task id and
  *     only the attempt whose commit message the driver receives
  *     contributes (Spark's commit coordinator guarantees one winner
  *     per partition);
  *   - driver `commit()` assigns global page numbers to the full pages
  *     (rename — no data movement), stream-merges the remainders into
  *     dense tail pages (driver work ≤ tasks·(pageSize−1) items, never
  *     data-sized), writes the `meta.json` envelope, and PUBLISHES with
  *     one atomic directory rename — readers see the old collection or
  *     the new one, never a torn mix;
  *   - `abort()` (driver) / task `abort()` delete the staging tree.
  *
  * Pages are dense by construction (every page exactly `pageSize`
  * items except the last), which is the planning contract the reader's
  * limit pushdown relies on. Collection order is not row order (full
  * pages first, merged remainders last) — a REST collection's paging
  * order is unspecified, same as the read side.
  *
  * SaveMode mapping: `overwrite` (TRUNCATE capability) replaces the
  * collection atomically; `append` is accepted only into an empty or
  * absent collection — appending would renumber pages under concurrent
  * readers, exactly what the atomic-replace protocol exists to avoid.
  */
final class PagedRestWriteBuilder(
    options: CaseInsensitiveStringMap, info: LogicalWriteInfo,
    rowLayout: Option[StructType] = None)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = {
    val pagesDir = Option(options.get("pages")).getOrElse(
      throw new IllegalArgumentException(
        "graft-rest requires option 'pages' (collection directory)"))
    val pageSize = options.getInt("pageSize", 100)
    require(pageSize > 0, "graft-rest: pageSize must be positive")
    // rowLayout: the PHYSICAL layout of the rows the writer will
    // receive when it differs from the declared write schema — see
    // PagedRestRowLevelOperation (group-based rewrites prepend an
    // operation column that LogicalWriteInfo does not declare)
    new PagedRestWrite(pagesDir, pageSize, doTruncate,
      info.queryId(), rowLayout.getOrElse(info.schema()))
  }
}

final class PagedRestWrite(
    pagesDir: String, pageSize: Int, truncate: Boolean,
    queryId: String, schema: StructType) extends Write {
  override def toBatch: BatchWrite =
    new PagedRestBatchWrite(pagesDir, pageSize, truncate, queryId, schema)
}

/** One task's contribution: its staged full pages (in local order) and
  * its optional remainder (path, item count). */
final case class PagedRestCommit(
    partitionId: Int, fullPages: Seq[String],
    remainder: Option[(String, Int)], nRows: Long)
    extends WriterCommitMessage

final class PagedRestBatchWrite(
    pagesDir: String, pageSize: Int, truncate: Boolean,
    queryId: String, schema: StructType) extends BatchWrite with Logging {

  private def staging: Path = Paths.get(s"$pagesDir.staging-$queryId")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(staging)
    new PagedRestWriterFactory(staging.toString, pageSize, schema)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val commits = messages.map(_.asInstanceOf[PagedRestCommit])
      .sortBy(_.partitionId)
    val committing = Paths.get(s"$pagesDir.committing-$queryId")
    deleteTree(committing)
    Files.createDirectories(committing)
    var page = 0L
    commits.foreach(_.fullPages.foreach { staged =>
      Files.move(Paths.get(staged), committing.resolve(s"page-$page.json"),
        StandardCopyOption.ATOMIC_MOVE)
      page += 1
    })
    // stream-merge remainders (each < pageSize items) into dense tail
    // pages; bounded by tasks·(pageSize−1) items of driver work
    val buf = new scala.collection.mutable.ArrayBuffer[String](pageSize)
    def flush(): Unit = if (buf.nonEmpty) {
      Files.write(committing.resolve(s"page-$page.json"),
        buf.mkString("{\"items\": [", ", ", "]}")
          .getBytes(StandardCharsets.UTF_8))
      page += 1
      buf.clear()
    }
    commits.flatMap(_.remainder).foreach { case (path, _) =>
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(Files.readAllBytes(Paths.get(path))).path("items")
      (0 until node.size()).foreach { i =>
        buf += node.get(i).toString
        if (buf.size == pageSize) flush()
      }
    }
    flush()
    val total = commits.map(_.nRows).sum
    Files.write(committing.resolve("meta.json"),
      s"""{"total": $total, "page_size": $pageSize}"""
        .getBytes(StandardCharsets.UTF_8))
    // publish: rename the OLD collection aside, move the new one into
    // place, delete the old dir last — a reader observes either the
    // complete old collection or the complete new one, never a TORN
    // one. There IS a brief not-found window between the two
    // ATOMIC_MOVEs (target→retired, committing→target); readers that
    // hit it should retry on a missing dir. Delete-then-rename would
    // widen that window to the whole new-collection move.
    val target = Paths.get(pagesDir)
    val retired = Paths.get(s"$pagesDir.old-$queryId")
    deleteTree(retired)
    if (Files.exists(target)) {
      val listing = Files.list(target)
      val occupied = try listing.iterator().asScala.nonEmpty
        finally listing.close()
      if (occupied && !truncate)
        throw new IllegalStateException(
          s"graft-rest: collection at $pagesDir is non-empty; appending " +
            "would renumber pages under readers — write with " +
            "mode('overwrite') to replace it atomically")
      Files.move(target, retired, StandardCopyOption.ATOMIC_MOVE)
    }
    Files.move(committing, target, StandardCopyOption.ATOMIC_MOVE)
    deleteTree(retired)
    deleteTree(staging)
    // REVISION LEDGER (`DESCRIBE HISTORY` for the group-based
    // connector, mirroring graft-kv's q240 surface): one JSONL line per
    // published revision, appended AFTER the publish succeeded. The
    // ledger lives BESIDE the collection (`<pages>.history.jsonl`) so
    // the atomic whole-collection replace cannot erase it — the
    // collection is the STATE, the ledger is the history of states.
    // Deterministic fields only (rev/total/pages/op); the query id is
    // a session artifact and stays out (the q240 discipline).
    val hist = Paths.get(s"$pagesDir.history.jsonl")
    val rev =
      if (Files.exists(hist))
        Files.readAllLines(hist, StandardCharsets.UTF_8).asScala
          .count(_.nonEmpty)
      else 0
    val op = if (truncate) "overwrite" else "append"
    Files.write(hist,
      (s"""{"rev": $rev, "total": $total, "pages": $page, "op": "$op"}""" +
        "\n").getBytes(StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    deleteTree(staging)
    deleteTree(Paths.get(s"$pagesDir.committing-$queryId"))
  }

  private def deleteTree(p: Path): Unit = if (Files.exists(p)) {
    Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
  }
}

final class PagedRestWriterFactory(
    stagingDir: String, pageSize: Int, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new PagedRestDataWriter(stagingDir, pageSize, schema, partitionId, taskId)
}

/** Executor-side writer: buffers at most one page of rendered items;
  * full pages flush to staged files as they fill (memory is one page,
  * not the task's data). */
final class PagedRestDataWriter(
    stagingDir: String, pageSize: Int, schema: StructType,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {

  private val idIdx = schema.fieldNames.indexOf("id")
  private val nameIdx = schema.fieldNames.indexOf("name")
  private val valueIdx = schema.fieldNames.indexOf("value")
  require(idIdx >= 0 && nameIdx >= 0 && valueIdx >= 0,
    s"graft-rest write needs columns id, name, value; got ${schema.fieldNames.mkString(", ")}")

  private val buf = new scala.collection.mutable.ArrayBuffer[String](pageSize)
  private val full = Seq.newBuilder[String]
  private var nFull = 0
  private var nRows = 0L

  private def esc(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  override def write(row: InternalRow): Unit = {
    // layout guard: the by-name ordinals above are only valid when the
    // physical row carries exactly the declared fields — a drifted
    // Spark write path (e.g. the row-level rewrite starting to project
    // its operation column away) must fail loudly, not garble items
    require(row.numFields == schema.length,
      s"graft-rest writer: row has ${row.numFields} fields but the " +
        s"declared write layout has ${schema.length} " +
        s"(${schema.fieldNames.mkString(", ")})")
    val id = if (row.isNullAt(idIdx)) "null" else row.getLong(idIdx).toString
    val name = if (row.isNullAt(nameIdx)) "null"
      else "\"" + esc(row.getUTF8String(nameIdx).toString) + "\""
    // non-finite doubles have no JSON literal — bare NaN/Infinity
    // tokens would make the whole staged page unparseable and (under
    // strict=false) silently skipped on read-back, losing a page of
    // rows while meta.json still counts them
    val value = if (row.isNullAt(valueIdx)) "null" else {
      val d = row.getDouble(valueIdx)
      if (java.lang.Double.isFinite(d)) d.toString else "null"
    }
    buf += s"""{"id": $id, "name": $name, "value": $value}"""
    nRows += 1
    if (buf.size == pageSize) flushPage()
  }

  private def flushPage(): Unit = {
    val p = Paths.get(stagingDir, s"task-$partitionId-$taskId-full-$nFull.json")
    Files.write(p, buf.mkString("{\"items\": [", ", ", "]}")
      .getBytes(StandardCharsets.UTF_8))
    full += p.toString
    nFull += 1
    buf.clear()
  }

  override def commit(): WriterCommitMessage = {
    val remainder = if (buf.isEmpty) None else {
      val p = Paths.get(stagingDir, s"task-$partitionId-$taskId-rem.json")
      Files.write(p, buf.mkString("{\"items\": [", ", ", "]}")
        .getBytes(StandardCharsets.UTF_8))
      Some(p.toString -> buf.size)
    }
    PagedRestCommit(partitionId, full.result(), remainder, nRows)
  }

  override def abort(): Unit = {
    full.result().foreach(p => Files.deleteIfExists(Paths.get(p)))
    Files.deleteIfExists(
      Paths.get(stagingDir, s"task-$partitionId-$taskId-rem.json"))
  }

  override def close(): Unit = {}
}
