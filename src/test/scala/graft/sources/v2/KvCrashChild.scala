package graft.sources.v2

import org.apache.spark.sql.SparkSession

/** Forked-JVM worker for [[KvCrossProcessSpec]]: a SECOND PROCESS that
  * appends to / compacts a graft-kv table and can be SIGKILLed at a
  * named protocol step (`-Dgraft.kv.pause.<point>=<ms>` announces the
  * step on stdout and sleeps — the supervising spec kills -9 inside the
  * window). This is the adversary the in-JVM contention suite cannot
  * play: a writer that dies WITHOUT running finally blocks, leaving its
  * lock, staged files, and half-moved logs exactly where the crash put
  * them.
  */
object KvCrashChild {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val table = args(1)
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("kv-crash-child")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("kv_child_wh_").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    mode match {
      case "append" =>
        val tag = args(2)
        (0 until 8).map(i => (9000L + i, tag, i.toDouble))
          .toDF("id", "name", "value")
          .write.format("graft-kv").option("path", table)
          .mode("append").save()
        println(s"[kv-child] append-committed $tag")
      case "compact" =>
        KvTable.compact(spark, table, args(2).toInt)
        println("[kv-child] compact-committed")
    }
    Console.out.flush()
    spark.stop()
    sys.exit(0)
  }
}
