package graft.ops

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("two components with a transitive chain collapse to min labels") {
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val got = ConnectedComponents.assign(edges, "a", "b")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L)))
  }

  test("long chain (diameter 9) converges to a single component") {
    val edges = (0L until 9L).map(i => (i, i + 1)).toDF("a", "b")
    val got = ConnectedComponents.assign(edges, "a", "b")
      .as[(Long, Long)].collect()
    assert(got.length == 10 && got.forall(_._2 == 0L))
  }

  test("duplicate, reversed, and self-loop edges do not change the result") {
    val edges = Seq((2L, 1L), (1L, 2L), (3L, 2L), (7L, 7L), (2L, 3L))
      .toDF("a", "b")
    val got = ConnectedComponents.assign(edges, "a", "b")
      .as[(Long, Long)].collect().sortBy(_._1)
    // the pure self-loop node 7 is dropped by symmetrize (no real edge)
    assert(got.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("empty edge set yields empty labels without error") {
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(ConnectedComponents.assign(edges, "a", "b").count() == 0L)
  }

  test("withSizes reports consistent cluster sizes") {
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val got = ConnectedComponents.withSizes(edges, "a", "b")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (5L, 5L, 2L), (6L, 5L, 2L)))
  }

  test("random graphs match a reference union-find (20 seeded cases)") {
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { _ =>
      val n = 2 + rnd.nextInt(24)
      val m = 1 + rnd.nextInt(30)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        // reference: path-compressed union-find, then min id per root
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val expected = nodes.groupBy(find).flatMap { case (_, ms) =>
          val lab = ms.min; ms.map(_ -> lab)
        }.toMap
        val got = ConnectedComponents
          .assign(edges.toDF("a", "b"), "a", "b")
          .as[(Long, Long)].collect().toMap
        assert(got == expected, s"n=$n edges=$edges")
      }
    }
  }

  test("a graph whose diameter exceeds maxIter fails loudly, not wrongly") {
    val edges = (0L until 10L).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      ConnectedComponents.assign(edges, "a", "b", maxIter = 3)
    }
  }

  test("q63 fixture invariants: canonical rep is the min member; q44 pairs co-clustered") {
    val d = "/root/testdata/sf0.001"
    val rows = graft.queries.LlmOps.q63DedupClusters(spark, d)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_._1).min == cid, s"cluster $cid rep is not min member")
      assert(members.forall(_._3 == members.length.toLong),
        s"cluster $cid size column inconsistent")
      assert(members.length >= 2, s"cluster $cid is a singleton — nodes only come from edges")
    }
    val lab = rows.map(r => r._1 -> r._2).toMap
    val pairs = graft.queries.LlmOps.q44LshPairs(spark, d)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    pairs.foreach { case (a, b) =>
      assert(lab(a) == lab(b), s"LSH pair ($a,$b) split across clusters")
    }
  }
}
