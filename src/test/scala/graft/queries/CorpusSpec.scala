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

  test("q61 chunking: full coverage, stride offsets, token-exact reconstruction") {
    import org.apache.spark.sql.functions._
    val chunks = Corpus.q61Chunk(spark, d)
      .as[(Long, Int, String, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2) }
    val docs = graft.Tables.documents(spark, d)
      .filter(col("source") === "src0")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
      .as[(Long, Seq[String])].collect().toMap
    assert(chunks.keySet == docs.keySet, "every src0 doc must be chunked")
    chunks.foreach { case (docId, cs) =>
      val t = docs(docId)
      // chunk i reproduces tokens [i*stride, i*stride + len)
      cs.foreach { case (_, cid, text, nTok) =>
        val want = t.slice(cid * 40, cid * 40 + 50)
        assert(text == want.mkString(" "), s"doc $docId chunk $cid")
        assert(nTok == want.length)
      }
      // coverage: the last chunk reaches the final token; ids are 0..k
      assert(cs.map(_._2).toSeq == cs.indices.toSeq)
      assert(cs.last._2 * 40 + cs.last._4 == t.length,
        s"doc $docId: chunks must cover the full token sequence")
    }
  }

  test("q62 stratified sample: k per stratum, content-deterministic, layout-independent") {
    import org.apache.spark.sql.functions._
    val out = Corpus.q62StratifiedSample(spark, d)
      .as[(String, Long, Long, Long)].collect()
    val perLang = out.groupBy(_._1)
    val langs = graft.Tables.documents(spark, d)
      .select("lang").distinct().as[String].collect().toSet
    assert(perLang.keySet == langs, "every stratum must be sampled")
    perLang.foreach { case (lang, rows) =>
      assert(rows.length == 20, s"$lang must contribute exactly k docs")
      // ranks are 1..k and hashes arrive ascending (the k smallest)
      assert(rows.sortBy(_._2).map(_._2).toSeq == (1L to 20L))
      val hs = rows.sortBy(_._2).map(_._4).toSeq
      assert(hs == hs.sorted, s"$lang sample must be the smallest hashes in order")
    }
    // the selection is a pure function of content: a different partition
    // layout of the same corpus yields the identical sample
    val docs2 = graft.Tables.documents(spark, d).repartition(7, col("doc_id"))
    docs2.createOrReplaceTempView("q62_repart")
    import graft.functions.{PolyHash, VectorExpressions}
    val hashed2 = docs2.select(col("lang"), col("doc_id"),
      VectorExpressions.hornerHash(col("text")).as("h"))
    val counts2 = hashed2.groupBy("lang").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("h").asc, col("doc_id").asc)
    val out2 = hashed2.join(broadcast(counts2), Seq("lang"))
      .filter(col("h") <= expr(s"${PolyHash.Mod * 60}L DIV n"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 20)
      .select(col("lang"), col("rn"), col("doc_id"), col("h"))
      .orderBy("lang", "rn")
      .as[(String, Long, Long, Long)].collect()
    assert(out2.toSeq == out.toSeq, "sample must be invariant to partition layout")
  }

  test("q69 mixture: rates approximated, selection invariant to layout") {
    val d = "/root/testdata/sf0.01"
    val rows = Corpus.q69Mixture(spark, d)
      .as[(String, Long, Long)].collect().toSeq
    val rates = Map("en" -> 0.75, "de" -> 0.5, "es" -> 0.25,
      "fr" -> 0.125, "zh" -> 0.125)
    assert(rows.map(_._1).toSet == rates.keySet)
    rows.foreach { case (lang, n, sel) =>
      assert(sel <= n)
      val got = sel.toDouble / n
      // hash-bucket sampling: binomial noise, generous 3-sigma-ish bound
      val tol = 3 * math.sqrt(rates(lang) * (1 - rates(lang)) / n) + 0.02
      assert(math.abs(got - rates(lang)) <= tol,
        s"$lang selected $got vs target ${rates(lang)} (tol $tol)")
    }
    // pure function of content: same result on a different partition layout
    val rows2 = Corpus.mixtureCounts(
        graft.Tables.documents(spark, d).repartition(7, col("doc_id")))
      .as[(String, Long, Long)].collect().toSeq
    assert(rows2.sortBy(_._1) == rows.sortBy(_._1))
  }

  test("q69 mixture: a lang outside MixRates selects nothing (no ANSI divide-by-zero)") {
    // ANSI is on by default in Spark 4: with a shared 0 default for num
    // AND den, `h % den` raised DIVIDE_BY_ZERO for any unlisted language
    // (round-6 advice). The den→1/num→0 defaults must instead keep zero
    // rows for it, matching the oracle's ELSE branches.
    val docs = Seq(
      (1L, "tlh", "Heghlu'meH QaQ jajvam"),
      (2L, "en", "an ordinary english document"),
      (3L, "tlh", "qapla' batlh je")).toDF("doc_id", "lang", "text")
    val rows = Corpus.mixtureCounts(docs)
      .as[(String, Long, Long)].collect()
      .map { case (k, n, s) => k -> ((n, s)) }.toMap
    assert(rows("tlh") == (2L, 0L), "unknown lang must count docs but select none")
    assert(rows("en")._1 == 1L)
  }

  test("q68 per-bucket prefilter: plan shows it, candidates bounded, result unchanged") {
    import org.apache.spark.sql.expressions.Window
    val d = "/root/testdata/sf0.001"
    val out = Corpus.q68VocabCoverage(spark, d)
    // the prefilter is IN the plan: a bucket-partitioned window before the
    // global one (two Window nodes, the first keyed on the hash bucket)
    val plan = out.queryExecution.executedPlan.toString()
    assert(plan.contains("__bucket"), s"plan must contain the bucketed prefilter window:\n$plan")
    val got = out.as[(Long, String, Long, Long)].collect().toSeq
    // identical to the unfiltered single-window formulation
    val ord = Seq(col("cnt").desc, col("token").asc)
    val wCum = Window.orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val full = graft.Tables.documents(spark, d)
      .select(explode(split(trim(col("text")), "\\s+")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .withColumn("cum_cnt", sum("cnt").over(wCum))
      .withColumn("rank", row_number().over(Window.orderBy(ord: _*)).cast("long"))
      .filter(col("rank") <= 50)
      .select(col("rank"), col("token"), col("cnt"), col("cum_cnt"))
      .orderBy("rank")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == full, "prefiltered and unfiltered formulations must agree exactly")
    // and the global window's input is bounded by construction: ≤ buckets·K
    val candidates = graft.Tables.documents(spark, d)
      .select(explode(split(trim(col("text")), "\\s+")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .withColumn("__bucket", pmod(xxhash64(col("token")), lit(32)))
      .withColumn("__brank",
        row_number().over(Window.partitionBy(col("__bucket")).orderBy(ord: _*)))
      .filter(col("__brank") <= 50)
      .count()
    assert(candidates <= 32L * 50L, s"candidate set must be ≤ buckets·K, got $candidates")
  }

  test("q73 inverted index: postings are the true top-tf docs despite the bucket prefilter") {
    import org.apache.spark.sql.expressions.Window
    val d = "/root/testdata/sf0.001"
    val out = Corpus.q73InvertedIndex(spark, d)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    // recompute the per-token top-5 with a plain single-window formulation
    val tf = graft.Tables.documents(spark, d)
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("token"))
      .groupBy("token", "doc_id").agg(count(lit(1)).as("tf"))
    val tokens = out.map(_._1).distinct
    val plain = tf.filter(col("token").isin(tokens: _*))
      .withColumn("rank", row_number().over(
        Window.partitionBy("token").orderBy(col("tf").desc, col("doc_id").asc)).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("token"), col("rank"), col("doc_id"), col("tf"))
      .as[(String, Long, Long, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(out.map(r => (r._1, r._3, r._4, r._5)).sortBy(r => (r._1, r._2)) == plain,
      "bucketed two-level top-k must equal the single-window top-k")
    // postings per token: exactly min(5, df); ranks contiguous from 1
    out.groupBy(_._1).foreach { case (tok, rows) =>
      val dfv = rows.head._2
      assert(rows.map(_._3).sorted == (1L to math.min(5L, dfv)),
        s"$tok ranks must be 1..min(5, df)")
    }
  }

  test("q75 ngram counts: one row set per order, ranks contiguous, counts recomputable") {
    import org.apache.spark.sql.expressions.Window
    val d = "/root/testdata/sf0.001"
    val rows = Corpus.q75NgramCounts(spark, d)
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(rows.map(_._1).distinct.sorted == Seq(1L, 2L, 3L))
    rows.groupBy(_._1).foreach { case (n, rs) =>
      assert(rs.map(_._2).sorted == (1L to rs.length), s"order $n ranks")
      rs.foreach { case (_, _, gram, _) =>
        assert(gram.split(" ").length == n, s"order-$n gram '$gram'")
      }
      // counts descend with rank (ties broken by gram asc)
      assert(rs.sortBy(_._2).map(_._4).sliding(2).forall(p => p.head >= p.last))
    }
    // spot-recompute: the top bigram's count equals a direct filter-count
    val (_, _, topBigram, cnt) = rows.filter(_._1 == 2L).minBy(_._2)
    val t = split(trim(col("text")), "\\s+")
    val direct = graft.Tables.documents(spark, d)
      .filter(size(t) >= 3)
      .select(explode(transform(sequence(lit(0), size(t) - 2),
        i => concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2)))).as("g"))
      .filter(col("g") === topBigram).count()
    assert(direct == cnt, s"top bigram '$topBigram' count $cnt vs direct $direct")
  }

  test("q65 packing: docs conserved, bins bounded, overflow flag consistent") {
    val d = "/root/testdata/sf0.001"
    val bins = Corpus.q65Pack(spark, d)
      .as[(String, Long, Long, Long, Boolean)].collect()
    assert(bins.nonEmpty)
    val docsPerSource = graft.Tables.documents(spark, d)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val binsBySource = bins.groupBy(_._1)
    assert(binsBySource.keySet == docsPerSource.keySet)
    binsBySource.foreach { case (src, bs) =>
      assert(bs.map(_._3).sum == docsPerSource(src), s"$src lost docs")
      assert(bs.map(_._2).min == 0L, s"$src does not start at bin 0")
      bs.foreach { case (_, bin, nDocs, nTok, overflow) =>
        assert(nDocs >= 1L)
        assert(overflow == (nTok > 256L), s"$src bin $bin overflow flag")
        // a bin only exceeds the budget via its final straddling doc: the
        // docs that START in it fit in < budget + one max-length doc
        assert(nTok < 256L + 100L, s"$src bin $bin implausibly large")
      }
    }
  }

  test("q84 BM25: scores recompute exactly from corpus statistics") {
    val out = Corpus.q84Bm25(spark, d)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // independent recompute with BigInt rational arithmetic
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
      .as[(Long, Seq[String])].collect()
    val n = BigInt(docs.length)
    val tt = BigInt(docs.map(_._2.length.toLong).sum)
    val queries = Seq(
      1L -> Seq("spark", "join"),
      2L -> Seq("dup", "stream"),
      3L -> Seq("hash", "table", "window"))
    val allTerms = queries.flatMap(_._2).distinct
    val dfm = allTerms.map(t => t -> BigInt(docs.count(_._2.contains(t)))).toMap
    val expected = queries.flatMap { case (qid, terms) =>
      docs.flatMap { case (id, toks) =>
        val sc = terms.map { term =>
          val tf = BigInt(toks.count(_ == term))
          if (tf == 0) BigInt(0)
          else {
            val df = dfm(term); val dl = BigInt(toks.length)
            (BigInt(1000000) * (2 * n - 2 * df + 1) * 22 * tf * tt) /
              ((2 * df + 1) * (10 * tt * tf + 3 * tt + 9 * dl * n))
          }
        }.sum
        if (sc > 0) Some((qid, id, sc.toLong)) else None
      }.sortBy { case (_, id, sc) => (-sc, id) }.take(10)
        .zipWithIndex.map { case ((q, id, sc), i) => (q, i + 1L, id, sc) }
    }
    assert(out.sortBy(r => (r._1, r._2)).toSeq == expected,
      "engine top-k must equal the BigInt reference ranking")
  }

  test("q85 heavy hitters: equals the exact count + threshold, ordered") {
    val out = Corpus.q85HeavyHitters(spark, d).as[(String, Long)].collect()
    val toks = Tables.documents(spark, d)
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .as[String].collect()
    val n = toks.length.toLong
    val exact = toks.groupBy(identity).map { case (t, v) => t -> v.length.toLong }
      .filter { case (_, f) => f * 48L > n }
      .toSeq.sortBy { case (t, f) => (-f, t) }
    assert(out.toSeq == exact,
      "two-pass sketch must produce the exact heavy-hitter set")
    assert(out.nonEmpty && !out.map(_._1).contains("dup"),
      "the rare token must fall below the 1/48 share threshold")
  }

  test("q92 split novelty: matches a per-split trigram-set replay") {
    val out = Corpus.q92SplitNovelty(spark, d)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val docs = Tables.documents(spark, d)
      .select(graft.ops.Splits.assign(col("doc_id"), Corpus.SplitCuts).as("split"),
        split(trim(col("text")), "\\s+").as("t"))
      .as[(String, Seq[String])].collect()
    val gramsBySplit = docs.groupBy(_._1).map { case (sp, ds) =>
      sp -> ds.flatMap(_._2.sliding(3).filter(_.length == 3).map(_.mkString(" ")))
        .toSet
    }
    val train = gramsBySplit.getOrElse("train", Set.empty)
    val expected = gramsBySplit.map { case (sp, g) =>
      sp -> (g.size.toLong, g.count(train.contains).toLong,
        g.count(!train.contains(_)).toLong)
    }
    assert(out == expected)
    val (tg, tin, tnov) = out("train")
    assert(tin == tg && tnov == 0L, "train grams are train-covered by definition")
  }

  test("q93 quota cap: equals a per-source sorted-take replay") {
    val out = Corpus.q93QuotaCap(spark, d)
      .as[(String, Long, Long, Long, Long)].collect()
    val docs = Tables.documents(spark, d)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .as[(String, Long, Long)].collect()
    val expected = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, ds) =>
      val kept = ds.sortBy(dc => (-dc._3, dc._2)).take(50)
      val total = ds.map(_._3).sum
      (src, ds.length.toLong, kept.length.toLong,
        kept.map(_._3).sum, total - kept.map(_._3).sum)
    }
    assert(out.toSeq == expected)
    out.foreach { case (src, nDocs, nKept, _, _) =>
      assert(nKept == math.min(50L, nDocs), s"$src cap arithmetic")
    }
  }
}
