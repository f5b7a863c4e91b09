package graft.pwhl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Data-dictionary cross-validation — the reference's fourth quality
  * substitute (`README.md:346` "Validation: Cross-checked with
  * `pwhl_data_dictionary.csv`", SURVEY §5.4), mechanized: the dictionary
  * CSV (`data/reference/pwhl_data_dictionary.csv` — field name, source
  * file, description) is a SCHEMA CONTRACT, and this operator diffs it
  * against the columns a pipeline actually reads, so documentation drift
  * is a queryable audit row instead of a stale markdown promise.
  *
  * Three verdicts per (source, field):
  *   - `ok`              — documented and present;
  *   - `missing_in_data` — documented but absent from the actual surface
  *     (a renamed/dropped column, or a whole documented file that no
  *     longer ships — the reference's own dictionary documents
  *     `game_capacity.csv`, which `data/raw/` does not contain);
  *   - `undocumented`    — present but absent from the dictionary (the
  *     drift that accumulates as pipelines add columns).
  *
  * The contract is config-sized (14 rows here; thousands at worst), so
  * the diff is driver-side set algebra over collected entries — the same
  * bounded-collect discipline as `ops/Validate` — returned as a
  * DataFrame so downstream gates can join/filter it like any audit.
  */
object Dictionary {

  final case class Entry(field: String, source: String, description: String)

  /** S1 discipline: explicit schema + header, never inferSchema. */
  private val DictSchema: StructType = StructType(Seq(
    StructField("Field Name", StringType),
    StructField("Source", StringType),
    StructField("Description", StringType)))

  /** Load a dictionary CSV; contract-sized, collected to the driver. */
  def load(s: SparkSession, path: String): Seq[Entry] =
    s.read.option("header", "true").schema(DictSchema).csv(path)
      .collect()
      .toSeq
      .map(r => Entry(r.getString(0), r.getString(1), r.getString(2)))

  /** Diff the declared contract against actual column lists, keyed by
    * the dictionary's source names. Returns (source, field, status)
    * under a total (source, field) order.
    */
  def crossCheck(s: SparkSession, entries: Seq[Entry],
                 actual: Map[String, Seq[String]]): DataFrame = {
    import s.implicits._
    val declared = entries.map(e => (e.source, e.field)).toSet
    val present = for ((src, cols) <- actual.toSeq; c <- cols) yield (src, c)
    val rows =
      declared.toSeq.map { case (src, f) =>
        val status =
          if (actual.get(src).exists(_.contains(f))) "ok" else "missing_in_data"
        (src, f, status)
      } ++
        present.filterNot(declared).map { case (src, c) =>
          (src, c, "undocumented")
        }
    rows.sortBy(r => (r._1, r._2))
      .toDF("source", "field", "status")
  }
}
