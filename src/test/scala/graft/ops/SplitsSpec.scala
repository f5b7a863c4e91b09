package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.PolyHash

class SplitsSpec extends SparkSpec {
  import spark.implicits._

  private val cuts = Seq("train" -> 800L, "val" -> 900L, "test" -> 1000L)

  test("every id gets exactly one label; proportions are near the cuts") {
    val ids = spark.range(0, 100000).toDF("id")
    val counts = ids.select(Splits.assign($"id", cuts).as("split"))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 100000L)
    assert(math.abs(counts("train") - 80000L) < 1500, s"train=${counts("train")}")
    assert(math.abs(counts("val") - 10000L) < 800, s"val=${counts("val")}")
    assert(math.abs(counts("test") - 10000L) < 800, s"test=${counts("test")}")
  }

  test("assignment is a pure function of the id — partition layout cannot move rows") {
    val base = spark.range(0, 5000).toDF("id")
    val a = base.select($"id", Splits.assign($"id", cuts).as("s"))
    val b = base.repartition(17, $"id" % 7)
      .select($"id", Splits.assign($"id", cuts).as("s"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "repartitioning must not change any assignment (randomSplit fails this)")
  }

  test("bucket matches the scalar formula the oracle SQL states") {
    val a = PolyHash.coefA(Splits.PermIndex)
    val b = PolyHash.coefB(Splits.PermIndex)
    val got = spark.range(0, 1000).toDF("id")
      .select($"id", Splits.bucket($"id").as("b")).as[(Long, Long)].collect()
    got.foreach { case (id, bk) =>
      val expect = ((id % PolyHash.Mod) * a + b) % PolyHash.Mod % Splits.Buckets
      assert(bk == expect, s"id=$id")
    }
    assert(Splits.bucketSql("doc_id").contains(a.toString) &&
      Splits.bucketSql("doc_id").contains(b.toString))
  }

  test("malformed cut lists fail loudly") {
    intercept[IllegalArgumentException](Splits.assign($"id", Seq("a" -> 500L)))
    intercept[IllegalArgumentException](
      Splits.assign($"id", Seq("a" -> 900L, "b" -> 800L, "c" -> 1000L)))
  }
}
