package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ValidateSpec extends SparkSpec {
  import spark.implicits._

  test("requireColumns passes when present, throws listing the missing set") {
    val df = Seq((1, "a")).toDF("k", "v")
    assert(Validate.requireColumns(df, Set("k", "v")) eq df)
    val e = intercept[Validate.ValidationException] {
      Validate.requireColumns(df, Set("k", "v", "w", "x"), "ctx")
    }
    assert(e.getMessage.contains("w, x"))
    assert(e.getMessage.contains("ctx"))
  }

  test("assertUniqueKeys passes on unique keys, aborts on duplicates with sample") {
    val ok = Seq((1, "a"), (2, "b")).toDF("k", "v")
    assert(Validate.assertUniqueKeys(ok, Seq("k")) eq ok)
    val dup = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
    val e = intercept[Validate.ValidationException] {
      Validate.assertUniqueKeys(dup, Seq("k"), "stage-x")
    }
    assert(e.getMessage.contains("stage-x"))
  }

  test("assertM1 enforces right-side uniqueness on compound keys") {
    val dim = Seq(("2025-01-01", "s1", 10), ("2025-01-01", "s2", 20)).toDF("d", "s", "cap")
    assert(Validate.assertM1(dim, Seq("d", "s")) eq dim)
    val bad = dim.union(Seq(("2025-01-01", "s1", 99)).toDF("d", "s", "cap"))
    intercept[Validate.ValidationException] {
      Validate.assertM1(bad, Seq("d", "s"))
    }
  }

  test("integrityWarnCount counts rows where rounded expected != actual") {
    val df = Seq((10.0, 2L, 20.0), (10.0, 3L, 30.01), (5.0, 1L, 5.004))
      .toDF("price", "n", "spend")
    // 5.004 rounds to 5.0 at scale 2 -> consistent; 30.01 != 30.00 -> violation
    assert(Validate.integrityWarnCount(df, $"price" * $"n", $"spend") == 1L)
  }
}
