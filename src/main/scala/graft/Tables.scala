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
  /** Schema-adaptive loader for the events fixture, whose physical `ts`
    * type has changed across driver regenerations:
    *
    *   - TIMESTAMP(NANOS): Spark's µs-based TimestampType refuses it
    *     ([PARQUET_TYPE_ILLEGAL]), so entry points set
    *     `spark.sql.legacy.parquet.nanosAsLong=true` and `ts` arrives as
    *     LongType epoch-nanos → `timestamp_micros(ts DIV 1000)`. Integer
    *     division is required — a double division would lose precision
    *     (epoch-nanos ~1.7e18 exceeds 2^53). DuckDB truncates ns→µs the
    *     same way, so both engines agree to the microsecond.
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads
    *     TimestampNTZType → cast to TimestampType. All graft sessions run
    *     with `spark.sql.session.timeZone=UTC`, so the cast reinterprets
    *     the same µs value with identical window/interval semantics and
    *     oracle stringification.
    *   - TIMESTAMP(MICROS, adjusted): already TimestampType → pass through.
    *
    * Branching on the READ dtype (not a config) means the same binary
    * works against either fixture vintage — the failure mode this guards
    * is a fixture regeneration landing mid-round (see VERDICT round 8).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported physical type $other")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
