package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.internal.Logging
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The second native DataSourceV2 connector (beside [[WeatherV2]]): a
  * PAGINATED REST collection as a Spark table —
  * `spark.read.format("graft-rest")` — the offset-paged `GET
  * /items?page=i` ingest every catalog/CRM/ticketing API exposes
  * (the reference's HTTP ingest generalized from one-shot payloads to
  * a paged collection).
  *
  * Connector-model mapping:
  *   - PLANNING fetches ONLY page 0's envelope metadata on the driver
  *     (`total` + `page_size` — the standard first-page probe): the page
  *     count is then known and pages are packed into
  *     `pagesPerPartition`-sized [[InputPartition]]s, so a million-page
  *     collection fans out across the cluster instead of following a
  *     next-token chain serially. Item bytes are NOT read at planning.
  *   - LIMIT PUSHDOWN ([[SupportsPushDownLimit]]): `df.limit(n)` plans
  *     only the first ⌈n / page_size⌉ pages — the connector fetches
  *     hundreds of pages fewer, and Spark's own limit still trims the
  *     tail rows (partial pushdown contract, so correctness never
  *     depends on it).
  *   - COLUMN PRUNING ([[SupportsPushDownRequiredColumns]]): a 2-column
  *     projection materializes 2 fields per item, same contract as the
  *     parquet scans.
  *   - PAGE-PREDICATE PUSHDOWN ([[SupportsPushDownFilters]]): `page`
  *     range/IN predicates prune PAGES at planning — the REST analogue
  *     of partition pruning — and are claimed fully (`page` is attached
  *     from the page index, so the predicate holds by construction).
  *   - COUNT PUSHDOWN ([[SupportsPushDownAggregates]]): COUNT(*),
  *     optionally GROUP BY page and under pushed page predicates, is
  *     answered from the envelope's `total`/`page_size` arithmetic —
  *     the `X-Total-Count` a live API serves — fetching ZERO pages.
  *     Strict mode only: lenient per-page isolation can drop rows, and
  *     count(*) must equal what the scan actually yields.
  *   - PER-PAGE FAILURE ISOLATION: a missing/malformed page logs and
  *     contributes zero rows under `strict=false` (the [[WeatherV2]]
  *     per-market discipline); `strict=true` fails the scan for
  *     tests/debugging.
  *   - the TRANSPORT SEAM stays injected (this container has zero
  *     egress): a page resolves to `<pages>/page-<i>.json` fixture
  *     files holding the exact envelope a paged API returns —
  *     `{"total": N, "page_size": M, "items": [{...}, ...]}`. A
  *     networked deployment swaps only [[PagedRestPartitionReader.readPage]];
  *     planning, pruning, limit and isolation are transport-independent.
  *
  * Options: `pages` (fixture dir), `pagesPerPartition` (default 4),
  * `strict` (default false).
  */
object PagedRestV2 {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("value", DoubleType),
    StructField("page", IntegerType)))

  /** One row per published revision — the `DESCRIBE HISTORY` surface
    * over the writer's `<pages>.history.jsonl` ledger. */
  val HistorySchema: StructType = StructType(Seq(
    StructField("rev", LongType, nullable = false),
    StructField("total", LongType, nullable = false),
    StructField("pages", LongType, nullable = false),
    StructField("op", StringType, nullable = false)))

  /** Driver-side planning probe: a standalone `meta.json` (what the
    * writer publishes) or, failing that, page 0's inline envelope (the
    * classic first-page probe of a live API). Same transport seam as
    * the page reads ([[graft.sources.Http.readBytes]]) — over HTTP the
    * meta probe falls back to the first-page probe ONLY when the meta
    * endpoint is ABSENT (HTTP 404 / missing fixture — `HttpError
    * .notFound`) — exactly the behavior against a live API with no
    * meta endpoint. EVERY other failure propagates: a transient one
    * (5xx, timeout) because the planning source must not change under
    * an outage, and a permanent non-404 one (401/403, an unreadable
    * meta.json) because an endpoint that EXISTS but cannot be read is
    * an auth/corruption fault, not a missing feature — silently
    * re-planning from a page-0 envelope there could disagree with the
    * meta a correctly-authenticated reader would see. */
  private[sources] def probe(pagesDir: String): (Long, Int) = {
    def read(name: String) = graft.sources.Http.readBytes(s"$pagesDir/$name")
    val (src, bytes) = read("meta.json") match {
      case Right(b) => ("meta.json", b)
      case Left(e) if !e.notFound =>
        throw new java.io.IOException(
          s"graft-rest: failure probing $pagesDir/meta.json: " +
            s"${e.message} — not falling back to page-0 (only an ABSENT " +
            "meta endpoint, 404/missing fixture, may switch the " +
            "planning source; " +
            (if (e.permanent) "this endpoint exists but is unreadable"
             else "a transient outage must not re-plan") + ")")
      case Left(_) => ("page-0.json",
        read("page-0.json").fold(
          e => throw new java.io.IOException(
            s"graft-rest: cannot probe $pagesDir: ${e.message}"), identity))
    }
    val root = new ObjectMapper().readTree(bytes)
    val total = root.path("total")
    val pageSize = root.path("page_size")
    require(total.isIntegralNumber && pageSize.isIntegralNumber &&
      pageSize.asInt() > 0,
      s"graft-rest: $src envelope must carry total and page_size > 0")
    (total.asLong(), pageSize.asInt())
  }
}

class PagedRestTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-rest"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (options.getBoolean("history", false)) PagedRestV2.HistorySchema
    else PagedRestV2.Schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    if (opts.getBoolean("history", false)) new PagedRestHistoryTable(opts)
    else new PagedRestTable(opts)
  }
}

/** `DESCRIBE HISTORY` for a paged-REST collection —
  * `spark.read.format("graft-rest").option("history", true)`: one row
  * per published REVISION from the `<pages>.history.jsonl` ledger the
  * writer appends AFTER each atomic publish (rev, total, pages, op).
  * The collection dir holds only the CURRENT state (group-based
  * replace); the sibling ledger is how an operator answers "what did
  * each publish land, and was it an append or a replace?" — the q240
  * surface mirrored onto the second connector. Metadata-only,
  * |revisions|-sized, one driver-planned partition.
  */
final class PagedRestHistoryTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private def dir: String = Option(options.get("pages")).getOrElse(
    throw new IllegalArgumentException("graft-rest requires option 'pages'"))
  override def name(): String = s"graft-rest-history($dir)"
  override def schema(): StructType = PagedRestV2.HistorySchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new PagedRestHistoryScan(dir)
    }
}

final case class PagedRestHistoryPartition(dir: String) extends InputPartition

final class PagedRestHistoryScan(dir: String) extends Scan with Batch {
  override def readSchema(): StructType = PagedRestV2.HistorySchema
  override def toBatch: Batch = this
  override def description(): String = s"graft-rest-history pages=$dir"
  override def planInputPartitions(): Array[InputPartition] =
    Array(PagedRestHistoryPartition(dir))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val d = p.asInstanceOf[PagedRestHistoryPartition].dir
        val m = new ObjectMapper()
        // same transport seam as the page reads; ONLY an absent ledger
        // (no revisions published yet — missing file or HTTP 404) is
        // zero rows. Any other failure (exhausted-retry 5xx, timeout,
        // unreadable file) throws: a transient outage must fail loudly,
        // never read as "no revisions published"
        val rows: Iterator[InternalRow] =
          graft.sources.Http.readBytes(s"$d.history.jsonl").fold(
            e =>
              if (e.notFound) Iterator.empty
              else throw new java.io.IOException(
                s"graft-rest history: cannot read $d.history.jsonl: " +
                  s"${e.message}"),
            bytes => new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
              .linesIterator).filter(_.nonEmpty).map { line =>
              val n = m.readTree(line)
              new GenericInternalRow(Array[Any](
                n.path("rev").asLong(), n.path("total").asLong(),
                n.path("pages").asLong(),
                UTF8String.fromString(n.path("op").asText())))
            }
        new PartitionReader[InternalRow] {
          private var cur: InternalRow = _
          override def next(): Boolean =
            if (!rows.hasNext) false
            else { cur = rows.next(); true }
          override def get(): InternalRow = cur
          override def close(): Unit = ()
        }
      }
    }
}

final class PagedRestTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {
  override def name(): String = s"graft-rest(${options.get("pages")})"
  override def schema(): StructType = PagedRestV2.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new PagedRestScanBuilder(options)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new PagedRestWriteBuilder(options, info)
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder =
    new org.apache.spark.sql.connector.write.RowLevelOperationBuilder {
      override def build(): org.apache.spark.sql.connector.write.RowLevelOperation =
        new PagedRestRowLevelOperation(options, info.command())
    }
}

/** GROUP-BASED row-level operation (SQL `DELETE FROM` / `UPDATE` /
  * `MERGE INTO` against a catalog-resolved paged collection — see
  * [[PagedRestCatalog]]): Spark's rewrite rules read the table through
  * [[newScanBuilder]], compute the complete post-operation rows, and
  * write them back through [[newWriteBuilder]]; the "group" here is the
  * WHOLE collection, so the write is the existing atomic
  * truncate-replace (readers observe the old collection or the new one,
  * never a torn mix — [[PagedRestBatchWrite]]'s publish protocol, which
  * is also what makes a failed MERGE leave the table untouched).
  *
  * The operation's scan builder is deliberately PUSHDOWN-FREE (no
  * filter/limit/aggregate/pruning interfaces): with whole-collection
  * replace, every surviving row must flow through the plan — a scan
  * that pruned pages under a pushed predicate would silently DROP the
  * pruned pages at write-back. Finer-than-collection replace granularity
  * needs scan↔write group coordination (file-level tracking), which an
  * offset-paged API fundamentally cannot offer: page numbers are
  * renumbered by any replace. Cost posture: a row-level command is a
  * full collection rewrite — correct for the REST-collection sizes this
  * connector models (pages fan out on read, the write is the bounded
  * two-phase commit); a 100 TB fact table wants q67's keyed MERGE or a
  * delta-based DSv2 instead.
  */
final class PagedRestRowLevelOperation(
    options: CaseInsensitiveStringMap,
    cmd: org.apache.spark.sql.connector.write.RowLevelOperation.Command)
    extends org.apache.spark.sql.connector.write.RowLevelOperation {
  override def command(): org.apache.spark.sql.connector.write.RowLevelOperation.Command = cmd
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new PagedRestScan(
        Option(options.get("pages")).getOrElse(throw new IllegalArgumentException(
          "graft-rest requires option 'pages' (collection directory)")),
        options.getInt("pagesPerPartition", 4),
        options.getBoolean("strict", false),
        PagedRestV2.Schema, None, PageBounds(), None)
    }
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    // Spark's group-based rewrite (ReplaceData) declares only the table
    // columns in LogicalWriteInfo, but — with no metadata columns in
    // play — its DataWritingSparkTask hands the writer the RAW rewrite
    // rows, which carry a prepended `__row_operation` int (the
    // carried/modified marker the runtime group-filtering machinery
    // uses). Hand the writer that actual physical layout so its by-name
    // ordinals line up; the writer's per-row field-count guard fails
    // loudly if a future Spark starts projecting the marker away.
    val rowLayout = StructType(
      StructField("__row_operation", IntegerType) +: info.schema().fields)
    val b = new PagedRestWriteBuilder(options, info, Some(rowLayout))
    b.truncate() // replace-the-group semantics, group = collection
    b
  }
}

/** Intersection of pushed `page` predicates: a closed [lo, hi] range
  * plus an optional explicit page set (from IN). */
final case class PageBounds(
    lo: Long = 0L, hi: Long = Long.MaxValue, inSet: Option[Set[Long]] = None) {
  def and(other: PageBounds): PageBounds = PageBounds(
    math.max(lo, other.lo), math.min(hi, other.hi),
    (inSet, other.inSet) match {
      case (Some(a), Some(b)) => Some(a intersect b)
      case (a, b) => a.orElse(b)
    })
  def isAll: Boolean = lo == 0L && hi == Long.MaxValue && inSet.isEmpty
}

/** Aggregate shapes the envelope can answer without reading a page. */
private[v2] sealed trait PagedRestAgg
private[v2] case object CountAll extends PagedRestAgg
private[v2] case object CountByPage extends PagedRestAgg

final class PagedRestScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit
    with SupportsPushDownFilters with SupportsPushDownAggregates {
  import org.apache.spark.sql.sources._

  private var required: StructType = PagedRestV2.Schema
  private var limit: Option[Int] = None
  private var bounds: PageBounds = PageBounds()
  private var accepted: Array[Filter] = Array.empty
  private var agg: Option[PagedRestAgg] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushLimit(l: Int): Boolean = {
    // a limit ABOVE a pushed aggregate must not shrink the page math
    if (agg.isEmpty) limit = Some(l)
    false // PARTIAL pushdown: fewer pages planned, Spark still trims rows
  }

  /** `page` predicates prune PAGES at planning — the REST analogue of
    * partition pruning. They are claimed FULLY (not re-evaluated by
    * Spark): `page` is attached by the reader from the page index, so
    * `page = i ⇔ row came from page-i` holds by construction. Anything
    * else stays Spark-side.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def long(v: Any): Option[Long] = v match {
      case n: java.lang.Number => Some(n.longValue())
      case _ => None
    }
    val (ours, residual) = filters.partition {
      case EqualTo("page", v) => long(v).isDefined
      case GreaterThan("page", v) => long(v).isDefined
      case GreaterThanOrEqual("page", v) => long(v).isDefined
      case LessThan("page", v) => long(v).isDefined
      case LessThanOrEqual("page", v) => long(v).isDefined
      case In("page", vs) => vs.forall(long(_).isDefined)
      case IsNotNull("page") => true // page is never null
      case _ => false
    }
    ours.foreach {
      case EqualTo(_, v) =>
        bounds = bounds.and(PageBounds(long(v).get, long(v).get))
      case GreaterThan(_, v) => bounds = bounds.and(PageBounds(lo = long(v).get + 1))
      case GreaterThanOrEqual(_, v) => bounds = bounds.and(PageBounds(lo = long(v).get))
      case LessThan(_, v) => bounds = bounds.and(PageBounds(hi = long(v).get - 1))
      case LessThanOrEqual(_, v) => bounds = bounds.and(PageBounds(hi = long(v).get))
      case In(_, vs) =>
        bounds = bounds.and(PageBounds(inSet = Some(vs.flatMap(long).toSet)))
      case IsNotNull(_) => ()
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    accepted = ours
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted

  /** COUNT(*) — optionally grouped by `page` — is answered from the
    * ENVELOPE (`total` + `page_size` give every page's exact item
    * count), the way a live API answers `X-Total-Count` without
    * serving a single item: ZERO pages are fetched. Complete pushdown;
    * composes with pushed page filters (the count of a page range is
    * envelope arithmetic too). STRICT mode only: under `strict=false`
    * a broken page contributes zero rows to a scan, so an envelope
    * count could disagree with the rows the same frame serves —
    * count(*) must observe what the scan yields, so the lenient mode
    * falls back to counting scanned rows.
    */
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    classify(aggregation).isDefined
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    agg = classify(aggregation)
    agg.isDefined
  }
  private def classify(a: Aggregation): Option[PagedRestAgg] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate.CountStar
    val countsOnly = a.aggregateExpressions.length == 1 &&
      a.aggregateExpressions.forall(_.isInstanceOf[CountStar]) &&
      limit.isEmpty && options.getBoolean("strict", false)
    a.groupByExpressions match {
      case Array() if countsOnly => Some(CountAll)
      case Array(r: NamedReference)
          if countsOnly && r.fieldNames.sameElements(Array("page")) =>
        Some(CountByPage)
      case _ => None
    }
  }

  override def build(): Scan = {
    val pagesDir = Option(options.get("pages")).getOrElse(
      throw new IllegalArgumentException(
        "graft-rest requires option 'pages' (directory of page-<i>.json)"))
    new PagedRestScan(pagesDir,
      options.getInt("pagesPerPartition", 4),
      options.getBoolean("strict", false), required, limit, bounds, agg)
  }
}

final class PagedRestScan(
    pagesDir: String, pagesPerPartition: Int, strict: Boolean,
    required: StructType, limit: Option[Int], bounds: PageBounds,
    agg: Option[PagedRestAgg]) extends Scan with Batch {
  require(pagesPerPartition > 0, "pagesPerPartition must be positive")
  override def readSchema(): StructType = agg match {
    case Some(CountAll) => StructType(Seq(
      StructField("count(*)", LongType, nullable = false)))
    case Some(CountByPage) => StructType(Seq(
      StructField("page", IntegerType, nullable = false),
      StructField("count(*)", LongType, nullable = false)))
    case None => required
  }
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-rest pages=$pagesDir limit=${limit.getOrElse(-1)}" +
      (if (bounds.isAll) "" else {
        val in = bounds.inSet.map(s => s.toSeq.sorted.mkString("{", ",", "}"))
        s" pushedPages=[${bounds.lo}..${bounds.hi}]${in.getOrElse("")}"
      }) +
      agg.map(a => s" pushedAggregate=$a").getOrElse("")

  /** Selected pages under the pushed bounds, truncated to the first
    * `maxPages` SELECTED pages (a pushed limit needs a prefix of what
    * the scan would actually read — counting from page 0 would
    * under-read a bounds-shifted scan), as chunked contiguous runs;
    * O(selected partitions) when no IN set is present. */
  private def selected(nPages: Long, maxPages: Long): Array[PagedRestPartition] = {
    val lo = math.max(0L, bounds.lo)
    val hi0 = math.min(nPages - 1, bounds.hi)
    if (hi0 < lo) return Array.empty
    bounds.inSet match {
      case None =>
        // overflow-safe truncation: lo + maxPages can wrap past 2^63
        val hi = if (maxPages >= hi0 - lo + 1) hi0 else lo + maxPages - 1
        if (hi < lo) return Array.empty
        (lo to hi by pagesPerPartition.toLong).map { first =>
          PagedRestPartition(pagesDir,
            first, math.min(first + pagesPerPartition - 1, hi))
        }.toArray
      case Some(s) =>
        val sel = s.filter(p => p >= lo && p <= hi0).toArray.sorted
          .take(math.min(maxPages, Int.MaxValue.toLong).toInt)
        // consecutive runs, each chunked to pagesPerPartition
        val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        sel.foreach { p =>
          runs.lastOption match {
            case Some((f, l)) if p == l + 1 => runs(runs.length - 1) = (f, p)
            case _ => runs += ((p, p))
          }
        }
        runs.toArray.flatMap { case (f, l) =>
          (f to l by pagesPerPartition.toLong).map { first =>
            PagedRestPartition(pagesDir,
              first, math.min(first + pagesPerPartition - 1, l))
          }
        }
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val (total, pageSize) = PagedRestV2.probe(pagesDir)
    agg match {
      case Some(shape) =>
        // envelope arithmetic — no page is ever fetched: every page
        // holds page_size items except the last (total - rest). An
        // EMPTY collection has zero pages here (the row-scan path keeps
        // its 1-page floor for the page-0 planning probe): a grouped
        // count must yield zero groups, not a phantom (page 0, 0) row
        val nPages = (total + pageSize - 1) / pageSize
        def size(p: Long): Long =
          if (p == nPages - 1) total - (nPages - 1) * pageSize else pageSize
        val pages = selected(nPages, Long.MaxValue)
          .flatMap(pt => pt.firstPage to pt.lastPage)
        val rows: Array[Array[Long]] = shape match {
          case CountAll => Array(Array(pages.map(size).sum))
          case CountByPage => pages.map(p => Array(p, size(p)))
        }
        Array(PagedRestAggPartition(rows, shape == CountByPage))
      case None =>
        // limit n needs only the first ceil(n / pageSize) SELECTED
        // pages (rows are dense within pages by the envelope contract)
        val nPages = math.max(1L, (total + pageSize - 1) / pageSize)
        val maxPages = limit match {
          case Some(n) => math.max(1L, (n.toLong + pageSize - 1) / pageSize)
          case None => Long.MaxValue
        }
        selected(nPages, maxPages).asInstanceOf[Array[InputPartition]]
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedRestReaderFactory(strict, required.fieldNames)

  /** STREAMING CURSOR INGEST — the growing-collection twin of the kv
    * changelog stream (q229's posture on the REST connector): offsets
    * are ITEM COUNTS (the classic offset cursor every paged API
    * supports), a trigger probes only the envelope's `total`, and a
    * micro-batch reads exactly the items in `[start, end)` — the pages
    * spanning that range, index-bounded within each page — so ingest
    * cost scales with the GROWTH since the last trigger, never the
    * collection. Restart-from-checkpoint resumes exactly after the
    * last ingested item: no replay, no loss (spec-pinned). */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    require(agg.isEmpty && limit.isEmpty && bounds.isAll,
      "graft-rest streaming read supports no pushed limit/filter/aggregate")
    new PagedRestMicroBatch(pagesDir, pagesPerPartition, strict,
      required.fieldNames)
  }
}

/** The append-only contract: a paged collection GROWS at the tail
  * (larger `total`, the existing item prefix immutable) — exactly what
  * offset-cursor pagination promises. A re-publish that SHRINKS the
  * collection (or rewrites history) invalidates every outstanding
  * cursor; the stream refuses LOUDLY (the kv changelog's
  * compaction-reset contract surfacing on the REST side) instead of
  * silently serving spliced pages — restart on a fresh checkpoint to
  * treat the republished collection as a new snapshot.
  */
final class PagedRestMicroBatch(pagesDir: String, pagesPerPartition: Int,
    strict: Boolean, fields: Array[String])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private case class CursorOffset(n: Long) extends Offset {
    override def json(): String = s"""{"n": $n}"""
  }

  /** `Trigger.AvailableNow` bound: the collection's total at stream
    * START, pinned by [[prepareForTriggerAvailableNow]] — every
    * subsequent micro-batch drains UP TO this cursor and the query then
    * stops, exactly the drain-then-stop contract (growth landing
    * mid-drain waits for the next run; an UNCOMMITTED batch from a
    * crashed run is re-planned from the checkpointed offset log first,
    * which the engine only guarantees for sources implementing this
    * interface — its single-batch fallback warns it may not). */
  private var availableNowBound: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowBound = Some(PagedRestV2.probe(pagesDir)._1)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Admission-controlled latest offset (the engine calls THIS form on
    * every trigger once the source declares admission control): the
    * live envelope total, or the pinned AvailableNow bound while one is
    * active — the drain target does NOT chase growth, and a collection
    * that shrinks below the pinned bound mid-drain trips
    * [[planInputPartitions]]'s fresh-probe cursor guard loudly instead
    * of being served as spliced pages. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    CursorOffset(availableNowBound.getOrElse(PagedRestV2.probe(pagesDir)._1))

  override def initialOffset(): Offset = CursorOffset(0L)
  override def latestOffset(): Offset =
    CursorOffset(PagedRestV2.probe(pagesDir)._1)
  override def deserializeOffset(json: String): Offset =
    CursorOffset(new ObjectMapper().readTree(json).path("n").asLong())

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CursorOffset].n
    val e = end.asInstanceOf[CursorOffset].n
    // a latest offset BELOW the checkpointed cursor means the
    // collection shrank under the stream — refuse, don't serve splices
    require(e >= s,
      s"graft-rest: collection at $pagesDir shrank below the stream's " +
        s"cursor (total now $e < cursor $s) — a re-publish rewrote " +
        "history; restart the stream on a fresh checkpoint")
    if (e == s) return Array.empty
    val (total, pageSize) = PagedRestV2.probe(pagesDir)
    require(total >= e,
      s"graft-rest: collection at $pagesDir shrank below the stream's " +
        s"cursor (total $total < offset $e) — a re-publish rewrote " +
        "history; restart the stream on a fresh checkpoint")
    val p0 = s / pageSize
    val p1 = (e - 1) / pageSize
    (p0 to p1 by pagesPerPartition.toLong).map { first =>
      PagedRestPartition(pagesDir, first,
        math.min(first + pagesPerPartition - 1, p1), s, e, pageSize)
        : InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedRestReaderFactory(strict, fields)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** `itemFrom`/`itemUntil` bound the GLOBAL item-index range [from,
  * until) this partition serves (cursor semantics for the micro-batch
  * stream; global index = page · pageSize + in-page index). The batch
  * defaults select everything and skip the arithmetic entirely. */
final case class PagedRestPartition(pagesDir: String, firstPage: Long, lastPage: Long,
    itemFrom: Long = 0L, itemUntil: Long = Long.MaxValue, pageSize: Int = 1)
    extends InputPartition

/** Driver-precomputed aggregate rows (envelope arithmetic) — the
  * "scan" that fetches nothing. */
final case class PagedRestAggPartition(rows: Array[Array[Long]], byPage: Boolean)
    extends InputPartition

final class PagedRestReaderFactory(strict: Boolean, fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case a: PagedRestAggPartition => new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < a.rows.length }
        override def get(): InternalRow = {
          val r = a.rows(i)
          if (a.byPage)
            new GenericInternalRow(Array[Any](Int.box(r(0).toInt), Long.box(r(1))))
          else new GenericInternalRow(Array[Any](Long.box(r(0))))
        }
        override def close(): Unit = {}
      }
      case p: PagedRestPartition =>
        new PagedRestPartitionReader(p, strict, fields)
    }
}

/** Executor-side reader: fetches this partition's page range one page at
  * a time (never the whole range in memory). Failure isolation boundary
  * is the PAGE: a broken page logs and yields zero rows (non-strict);
  * the rest of the range — and every other partition — is unaffected.
  */
final class PagedRestPartitionReader(
    p: PagedRestPartition, strict: Boolean, fields: Array[String])
    extends PartitionReader[InternalRow] with Logging {

  private var page = p.firstPage - 1
  private var items: JsonNode = _
  private var idx = 0

  /** The transport seam, dispatched in ONE place
    * ([[graft.sources.Http.readBytes]]): a fixture collection reads
    * `<pages>/page-<i>.json` from disk, an `http(s)://` collection GETs
    * the same path over the wire (timeouts + bounded retry on 5xx;
    * 4xx fails fast) — nothing else in the reader changes, and an HTTP
    * failure lands on the same per-PAGE isolation boundary a corrupt
    * fixture page does. */
  private def readPage(i: Long): JsonNode = {
    val bytes = graft.sources.Http.readBytes(s"${p.pagesDir}/page-$i.json")
      .fold(e => throw new java.io.IOException(e.message), identity)
    val root = new ObjectMapper().readTree(bytes)
    val it = root.path("items")
    require(it.isArray, s"page-$i has no items array")
    it
  }

  /** In-page index this page starts serving at (cursor lower bound). */
  private def startIdx(pg: Long): Int =
    math.max(0L, p.itemFrom - pg * p.pageSize).toInt

  /** One past the last in-page index this page may serve (cursor upper
    * bound); Long.MaxValue (the batch default) disables the cap. */
  private def pageCap: Int =
    if (p.itemUntil == Long.MaxValue) items.size()
    else math.min(items.size().toLong,
      math.max(0L, p.itemUntil - page * p.pageSize)).toInt

  private def advancePage(): Boolean = {
    while (page < p.lastPage) {
      page += 1
      idx = startIdx(page)
      try {
        items = readPage(page)
        if (idx < pageCap) return true
      } catch {
        case e: Exception if !strict =>
          logWarning(s"graft-rest: skipping page $page: ${e.getMessage}")
          items = null
      }
    }
    false
  }

  override def next(): Boolean = {
    if (items != null && idx < pageCap) true
    else advancePage()
  }

  override def get(): InternalRow = {
    val item = items.get(idx)
    idx += 1
    val row = new GenericInternalRow(fields.length)
    var i = 0
    while (i < fields.length) {
      row.update(i, fields(i) match {
        case "page" => Int.box(page.toInt)
        case "id" =>
          val v = item.path("id")
          if (v.isIntegralNumber) Long.box(v.asLong()) else null
        case "name" =>
          val v = item.path("name")
          if (v.isTextual) UTF8String.fromString(v.asText()) else null
        case "value" =>
          val v = item.path("value")
          if (v.isNumber) Double.box(v.asDouble()) else null
        case other => null
      })
      i += 1
    }
    row
  }

  override def close(): Unit = {}
}
