package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.internal.Logging
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S4 completed as a native DataSourceV2 connector: the reference's
  * per-market HTTP-JSON weather ingest (ingest_weather.py:26-48) becomes
  * `spark.read.format("graft-weather")`, the idiomatic Spark shape for a
  * partitioned external API.
  *
  * Mapping of the reference's ingest loop onto the connector model:
  *   - the market registry (config/markets.yml) drives PLANNING: one
  *     [[InputPartition]] per market, so at cluster scale each market's
  *     payload is fetched and pivoted by its own task, in parallel —
  *     the reference's sequential for-loop, distributed;
  *   - the per-market failure isolation (ingest_weather.py:79-97: a
  *     failed market is logged and skipped, the run continues) becomes
  *     PER-PARTITION isolation: a reader whose payload is missing or
  *     malformed logs and emits zero rows instead of failing the scan
  *     (`strict=true` restores fail-fast for tests/debugging);
  *   - the transport seam stays injected: this container has zero
  *     egress, so the partition reader resolves `<payloads>/<market>
  *     .json` fixture files — the exact bytes `requests.get(...).json()`
  *     would have produced. A networked deployment swaps ONLY the
  *     `readPayload` body; planning, schema, pivot, and isolation are
  *     transport-independent.
  *   - the columnar→row pivot (`{"hourly": {"time": [...], ...}}` into
  *     tidy hourly rows, arrays_zip semantics incl. null-padding of
  *     short arrays) runs inside the reader, emitting [[InternalRow]]s
  *     directly — no intermediate JSON DataFrame.
  *
  * Column pruning is pushed down ([[SupportsPushDownRequiredColumns]]):
  * a query projecting two columns materializes two, not seven — the same
  * contract the parquet scans honor (`ReadSchema`).
  *
  * Options: `payloads` (dir of per-market fixture payloads), `markets`
  * (markets.yml path), `strict` (default false).
  */
object WeatherV2 {
  val Schema: StructType = StructType(Seq(
    StructField("time", StringType),
    StructField("temperature_2m", DoubleType),
    StructField("relative_humidity_2m", DoubleType),
    StructField("wind_speed_10m", DoubleType),
    StructField("precipitation", DoubleType),
    StructField("market", StringType),
    StructField("venue", StringType)))

  private[v2] val ValueCols =
    Seq("temperature_2m", "relative_humidity_2m", "wind_speed_10m", "precipitation")
}

class WeatherTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-weather"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WeatherV2.Schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WeatherTable(new CaseInsensitiveStringMap(properties))
}

final class WeatherTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"graft-weather(${options.get("payloads")})"
  override def schema(): StructType = WeatherV2.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    // getTable receives the merged reader options as table properties;
    // newScanBuilder's map is a second copy — either works, use ours.
    new WeatherScanBuilder(options)
  }
}

final class WeatherScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = WeatherV2.Schema
  override def pruneColumns(requiredSchema: StructType): Unit = {
    // Spark hands back a subset of Schema in Schema's field order.
    required = requiredSchema
  }
  override def build(): Scan = {
    val payloadsDir = Option(options.get("payloads")).getOrElse(
      throw new IllegalArgumentException(
        "graft-weather requires option 'payloads' (directory of <market>.json)"))
    val marketsYml = Option(options.get("markets")).getOrElse(
      throw new IllegalArgumentException(
        "graft-weather requires option 'markets' (markets.yml path)"))
    val strict = options.getBoolean("strict", false)
    new WeatherScan(payloadsDir, marketsYml, strict, required)
  }
}

final class WeatherScan(
    payloadsDir: String, marketsYml: String, strict: Boolean,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-weather payloads=$payloadsDir markets=$marketsYml"

  /** Planning: the 8-row market registry is driver-side config (the
    * reference loads it the same way, transform_weather.py:28-42); each
    * market becomes one partition. No data is read at planning time.
    */
  override def planInputPartitions(): Array[InputPartition] =
    graft.pwhl.MarketsYaml.parse(marketsYml).map { m =>
      WeatherPartition(m.market, m.venue, s"$payloadsDir/${m.market}.json")
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new WeatherReaderFactory(strict, required.fieldNames)
}

final case class WeatherPartition(market: String, venue: String, path: String)
    extends InputPartition

final class WeatherReaderFactory(strict: Boolean, fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WeatherPartitionReader(partition.asInstanceOf[WeatherPartition], strict, fields)
}

/** Executor-side reader: one market's columnar payload → hourly rows.
  * Failure isolation boundary: anything wrong with THIS market (missing
  * file, malformed JSON, missing `hourly`/`time`) ends this partition
  * with zero rows and a log line; other markets are unaffected.
  */
final class WeatherPartitionReader(
    p: WeatherPartition, strict: Boolean, fields: Array[String])
    extends PartitionReader[InternalRow] with Logging {

  private var idx = -1
  private var times: JsonNode = _
  private var values: Map[String, JsonNode] = Map.empty
  private var n = 0

  // payload parse happens lazily on the first next() so construction
  // (which Spark may do speculatively) never throws
  private var opened = false
  private def open(): Unit = {
    opened = true
    try {
      // THE transport seam (one dispatch, graft.sources.Http): fixture
      // file or live HTTP GET — planning, pivot, pruning, isolation are
      // identical either way, and an HTTP failure (timeout, 5xx after
      // retries, 4xx) lands on the same per-market boundary a malformed
      // fixture does
      val bytes = graft.sources.Http.readBytes(p.path)
        .fold(e => throw new java.io.IOException(e.message), identity)
      val root = new ObjectMapper().readTree(bytes)
      val hourly = root.path("hourly")
      if (!hourly.isObject || !hourly.path("time").isArray)
        throw new IllegalArgumentException("payload has no hourly.time array")
      times = hourly.path("time")
      values = WeatherV2.ValueCols
        .map(c => c -> hourly.path(c)).toMap
      n = times.size()
    } catch {
      case e: Exception if !strict =>
        logWarning(s"graft-weather: skipping market ${p.market}: ${e.getMessage}")
        n = 0
    }
  }

  override def next(): Boolean = {
    if (!opened) open()
    idx += 1
    idx < n
  }

  override def get(): InternalRow = {
    val row = new GenericInternalRow(fields.length)
    var i = 0
    while (i < fields.length) {
      row.update(i, fields(i) match {
        case "time" =>
          val t = times.get(idx)
          if (t == null || t.isNull) null else UTF8String.fromString(t.asText())
        case "market" => UTF8String.fromString(p.market)
        case "venue" => UTF8String.fromString(p.venue)
        case c =>
          // arrays_zip semantics: a short or absent value array yields
          // null for the missing positions, not a partition failure
          val arr = values(c)
          val v = if (arr != null && arr.isArray && idx < arr.size()) arr.get(idx) else null
          if (v == null || v.isNull) null else java.lang.Double.valueOf(v.asDouble())
      })
      i += 1
    }
    row
  }

  override def close(): Unit = {}
}
