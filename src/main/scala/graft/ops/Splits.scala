package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.PolyHash

/** Deterministic dataset splitting — the train/val/test assignment every
  * training-data pipeline needs. Assignment is a pure function of the
  * row's id (an affine permutation in Z/p from the [[PolyHash]] family,
  * reduced mod `Buckets`), so it is reproducible across runs, engines,
  * partitionings, and cluster sizes — unlike `randomSplit`, whose output
  * depends on partition layout. Holding out by id also keeps every
  * version of a document on the same side of the split when upstream
  * re-processing changes row order.
  *
  * Pure column arithmetic: no shuffle, no UDF, fully inside whole-stage
  * codegen; at 100 TB the assignment is free relative to the scan. The
  * same integer math runs in the DuckDB oracle (q53).
  */
object Splits {
  /** Buckets per id — two-decimal split percentages. */
  val Buckets: Long = 1000L

  /** Permutation index reserved for splitting (disjoint from the LSH
    * families, which use 0..63). */
  val PermIndex: Int = 99

  /** Uniform bucket in [0, Buckets) from a non-negative integral id.
    * Ids must be < PolyHash.Mod (hash wider ids down first — e.g.
    * [[PolyHash.horner]] of the natural key).
    */
  def bucket(id: Column): Column = {
    val a = PolyHash.coefA(PermIndex)
    val b = PolyHash.coefB(PermIndex)
    pmod(id % PolyHash.Mod * a + b, lit(PolyHash.Mod)) % Buckets
  }

  /** Split label from cumulative per-mille thresholds, e.g.
    * `assign(col("doc_id"), Seq("train" -> 800, "val" -> 900, "test" -> 1000))`
    * = 80/10/10. Thresholds must be increasing and end at `Buckets`.
    */
  def assign(id: Column, cuts: Seq[(String, Long)]): Column = {
    require(cuts.nonEmpty && cuts.last._2 == Buckets,
      s"cumulative thresholds must end at $Buckets: $cuts")
    require(cuts.map(_._2) == cuts.map(_._2).sorted.distinct,
      s"cumulative thresholds must be strictly increasing: $cuts")
    val b = bucket(id)
    cuts.init.foldRight(lit(cuts.last._1)) { case ((name, cut), rest) =>
      when(b < cut, lit(name)).otherwise(rest)
    }
  }

  /** The same bucket arithmetic as DuckDB SQL, kept HERE so the two
    * formulations cannot drift (the q40/q53 oracle pattern). */
  def bucketSql(idExpr: String): String = {
    val a = PolyHash.coefA(PermIndex)
    val b = PolyHash.coefB(PermIndex)
    s"(($idExpr % ${PolyHash.Mod}) * $a + $b) % ${PolyHash.Mod} % $Buckets"
  }

  /** The [[assign]] CASE ladder as DuckDB SQL generated from the SAME
    * cuts, so the q53/q83 oracles and the engine cannot drift. */
  def assignSql(idExpr: String, cuts: Seq[(String, Long)]): String = {
    val b = bucketSql(idExpr)
    cuts.init.map { case (n, c) => s"WHEN $b < $c THEN '$n'" }
      .mkString("CASE ", " ", s" ELSE '${cuts.last._1}' END")
  }
}
