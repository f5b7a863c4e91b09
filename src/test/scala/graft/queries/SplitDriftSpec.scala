package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables
import graft.ops.Splits

class SplitDriftSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private def expected: Seq[(String, Long, String, Long, Long, Long)] = {
    val counts = Tables.documents(spark, d)
      .select(Splits.assign(col("doc_id"), Corpus.SplitCuts).as("split"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .groupBy("split", "w").agg(count(lit(1)).as("c"))
      .as[(String, String, Long)].collect()
    val totals = counts.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val vocab = counts.map(_._2).distinct
    val byKey = counts.map(r => (r._1, r._2) -> r._3).toMap
    val nTr = totals("train")
    totals.keys.filter(_ != "train").toSeq.sorted.flatMap { sp =>
      val nSp = totals(sp)
      val rows = vocab.map { w =>
        val cTr = byKey.getOrElse(("train", w), 0L)
        val cSp = byKey.getOrElse((sp, w), 0L)
        val drift = ((BigInt(cTr) * nSp - BigInt(cSp) * nTr).abs
          * BigInt(1000000000L) / (BigInt(nTr) * nSp)).toLong
        (w, cTr, cSp, drift)
      }
      rows.sortBy(r => (-r._4, r._1)).take(15).zipWithIndex.map {
        case ((w, cTr, cSp, drift), i) => (sp, (i + 1).toLong, w, cTr, cSp, drift)
      }
    }
  }

  test("q96 matches an independent full-vocabulary recomputation exactly") {
    val out = Corpus.q96SplitDrift(spark, d)
      .as[(String, Long, String, Long, Long, Long)].collect().toSeq
    assert(out == expected)
  }

  test("q96 drift is symmetric-free of floats: values recompute from counts") {
    val out = Corpus.q96SplitDrift(spark, d)
      .as[(String, Long, String, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val splits = out.map(_._1).distinct.sorted
    assert(splits.forall(Set("val", "test")), s"unexpected splits $splits")
    splits.foreach { sp =>
      val ranks = out.filter(_._1 == sp).map(_._2).toSeq
      assert(ranks == (1L to ranks.length).toSeq, "ranks must be dense from 1")
    }
  }

  test("q96's final plan never re-reads the corpus past the checkpoint") {
    val plan = Corpus.q96SplitDrift(spark, d)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 0, s"corpus must not be re-read past the checkpoint, got $scans")
  }
}
