package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (see TESTDATA.md).
  *
  * Parquet carries the schema, so a load is metadata-only; Catalyst pushes
  * filters and column pruning into the scan (verify with
  * `.explain("formatted")` → `PushedFilters` / `ReadSchema`). At cluster
  * scale the same call reads a partitioned directory tree; nothing here
  * assumes a single file.
  */
object Tables {
  /** Opt-in reuse of one ANALYZED DataFrame per table path for the life of
    * the process. `spark.read.parquet` lists files and reads footers at
    * plan-construction time; across a 58-query bench run that fixed
    * planning cost is re-paid per query even though the underlying files
    * never change. Bench enables this (one session, immutable fixture
    * dirs); Verify and tests keep the default cold path so an overwritten
    * test dir is never served a stale file index. Reuse caches METADATA
    * only — the data itself is still scanned from parquet per query, so
    * timed plans are unchanged.
    */
  @volatile private var reuse = false
  private val byPath =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  def enableReuse(): Unit = { reuse = true }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    pathTable(spark, s"$dir/$name.parquet")

  /** Same reuse semantics for an arbitrary parquet path (used by the
    * maintained layouts in `graft.sources.Layouts`). */
  def pathTable(spark: SparkSession, path: String): DataFrame =
    if (reuse) byPath.computeIfAbsent(path, p => spark.read.parquet(p))
    else spark.read.parquet(path)

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** The events fixture stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark's µs-based TimestampType refuses outright ([PARQUET_TYPE_ILLEGAL]).
    * The session must therefore be built with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (every graft entry point —
    * Verify, Bench, ExplainAudit, SparkSpec — sets it at construction; this
    * getter deliberately does NOT mutate session state as a side effect).
    * `nanosAsLong` reads the raw int64, and `ts DIV 1000` converts to µs with
    * integer division — a double division would lose precision (epoch-nanos
    * ~1.7e18 exceeds 2^53). DuckDB-oracle side keeps native TIMESTAMP_NS;
    * both engines therefore agree to the microsecond (ns truncated).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    table(s, d, "events").withColumn(
      "ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
