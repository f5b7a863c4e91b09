package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for selected registered queries — the
  * audit loop the brief prescribes (explain until it's the plan you'd
  * want, not the first one that passed).
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val names: Set[String] = if (args.nonEmpty) args.toSet else graft.SparkEntry.queries.keySet
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // events.parquet is TIMESTAMP(NANOS) — see Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // pin the managed-table location (q59/q60 bucketed layouts) inside
      // the repo regardless of the invoking working directory
      .config("spark.sql.warehouse.dir", "/root/repo/spark-warehouse")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.filter(q => names(q._1)).toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        println(fn(spark, "/root/testdata/sf0.001").queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
    spark.stop()
  }
}
