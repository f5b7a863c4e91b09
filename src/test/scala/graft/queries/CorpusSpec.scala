package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("q53 split audit partitions every document exactly once") {
    val out = Corpus.q53HashSplit(spark, d)
      .as[(String, String, Long, Long)].collect()
    val bySource = out.groupBy(_._1)
    val truth = Tables.documents(spark, d)
      .groupBy("source").agg(count(lit(1)).as("n"), sum("n_chars").as("c"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(bySource.keySet == truth.keySet)
    bySource.foreach { case (src, rows) =>
      assert(rows.map(_._3).sum == truth(src)._1, s"doc counts for $src")
      assert(rows.map(_._4).sum == truth(src)._2, s"char sums for $src")
      assert(rows.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
    }
  }

  test("q55 tf-idf: exactly top-5 per source, integer scores, recomputable") {
    val out = Corpus.q55Tfidf(spark, d)
      .as[(String, String, Long, Long, Long)].collect()
    val perSource = out.groupBy(_._1)
    assert(perSource.nonEmpty)
    perSource.foreach { case (src, rows) =>
      assert(rows.length == 5, s"$src should have exactly 5 terms")
      rows.foreach { case (_, _, tf, df, score) =>
        assert(score == tf * 1000000L / df, "score must be exact integer arithmetic")
        assert(df > 0 && tf > 0)
      }
    }
    // scores within a source arrive sorted descending (term asc on ties)
    perSource.values.foreach { rows =>
      val s = rows.map(r => (-r._5, r._2)).toSeq
      assert(s == s.sorted, "per-source ordering must be (score desc, term asc)")
    }
  }

  test("q55 reads the corpus once: window-derived df, no tf-df join") {
    val plan = Corpus.q55Tfidf(spark, d).queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected a single corpus scan, got $scans:\n$plan")
    assert(!plan.contains("Join"),
      s"df must come from a window over the shared aggregate, not a join:\n$plan")
  }
}
