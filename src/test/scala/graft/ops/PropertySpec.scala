package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.functions.MinHash

/** Property-based invariants (SURVEY §5 test plan): idempotence of the
  * normalizers, permutation-invariance of aggregation, conservation
  * through grouping, and MinHash monotonicity — checked over generated
  * inputs (scalacheck Gen driven with fixed seeds — the scalatest
  * bridge artifact isn't in the offline cache, so sampling is explicit
  * and deterministic).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error(s"generator failed at seed $seed"))

  private val messyString: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '\t', '-', '\'', '_', '!')))
      .map(_.mkString.take(40))

  test("slugify is idempotent and emits only [a-z0-9_] with no edge underscores") {
    val inputs = (1L to 40L).map(sample(messyString, _))
    val out = inputs.toDF("s")
      .select(col("s"), Cleaning.slugify(col("s")).as("x"))
      .select(col("x"), Cleaning.slugify(col("x")).as("xx"))
      .as[(String, String)].collect()
    out.foreach { case (x, xx) =>
      assert(x.matches("[a-z0-9_]*"), s"charset violation: <$x>")
      assert(!x.startsWith("_") && !x.endsWith("_"), s"edge underscore: <$x>")
      assert(xx == x, s"not idempotent: <$x> -> <$xx>")
    }
  }

  test("normTitle is idempotent over generated messy strings") {
    val inputs = (100L to 140L).map(sample(messyString, _))
    val out = inputs.toDF("s")
      .select(Cleaning.normTitle(col("s")).as("x"))
      .select(col("x"), Cleaning.normTitle(col("x")).as("xx"))
      .as[(String, String)].collect()
    out.foreach { case (x, xx) => assert(xx == x, s"not idempotent: <$x> -> <$xx>") }
  }

  test("decimal-sum aggregation is invariant under row permutation and partitioning") {
    val valuesGen = Gen.listOfN(30, Gen.chooseNum(-1e6, 1e6))
    (1L to 10L).foreach { seed =>
      val xs = sample(valuesGen, seed)
      val shuffled = new scala.util.Random(seed).shuffle(xs)
      def total(vs: List[Double], parts: Int): Double =
        vs.toDF("x").repartition(parts)
          .agg(graft.queries.Num.sumD(col("x"), 4)).as[Double].head()
      assert(total(xs, 4) == total(shuffled, 3))
    }
  }

  test("conservation: per-group decimal sums total the ungrouped sum exactly") {
    val rowsGen = Gen.listOfN(40, Gen.zip(Gen.chooseNum(1, 5), Gen.chooseNum(0.0, 1e4)))
    (1L to 10L).foreach { seed =>
      val rows = sample(rowsGen, seed)
      val df = rows.toDF("k", "v")
      val grouped = df.groupBy("k").agg(sum(graft.queries.Num.dec(col("v"))).as("s"))
        .agg(sum(col("s")).cast("double")).as[Double].head()
      val direct = df.agg(sum(graft.queries.Num.dec(col("v"))).cast("double")).as[Double].head()
      assert(grouped == direct)
    }
  }

  test("minhash: adding shingles can only lower each signature position") {
    val tokGen = Gen.nonEmptyListOf(Gen.identifier.map(_.take(8)))
    (1L to 15L).foreach { seed =>
      val a = sample(tokGen, seed)
      val extra = sample(tokGen, seed + 1000)
      val (sa, sab) = Seq((a, a ++ extra)).toDF("a", "ab")
        .select(
          MinHash.signature(col("a"), 1, 32).as("sa"),
          MinHash.signature(col("ab"), 1, 32).as("sab"))
        .as[(Seq[Long], Seq[Long])].head()
      sa.zip(sab).foreach { case (x, y) =>
        assert(y <= x, s"seed $seed: superset min exceeded subset min")
      }
    }
  }
}
