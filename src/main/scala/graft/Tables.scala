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
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

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
