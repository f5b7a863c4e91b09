package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{ExactDecimal, MinHash, VectorExpressions}

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("SQL surface equals the column API for every registered function") {
    GraftExtensions.register(spark)
    Seq((Seq(1.0f, 2.0f, 3.0f), Seq(3.0f, 2.0f, 1.0f),
        Seq("the", "quick", "brown", "fox", "jumps"), "abcdefghij", 12.345))
      .toDF("a", "b", "toks", "text", "x")
      .createOrReplaceTempView("ext_t")

    val viaSql = spark.sql(
      """SELECT cosine_similarity(a, b) AS cos, simhash64(toks) AS sh,
        |  poly_simhash(toks) AS psh,
        |  minhash_signature(toks, 2, 16) AS sig,
        |  minhash_signature(toks, 2, 16, true) AS sigp,
        |  minhash_band_buckets(toks, 2, 16, 4, true) AS bands,
        |  rolling_fingerprints(text, 4, 2) AS fps,
        |  scaled_long(x, 6) AS sl,
        |  poly_horner(text) AS ph,
        |  nfc_normalize(text) AS nt
        |FROM ext_t""".stripMargin).head()

    val viaApi = spark.table("ext_t").select(
      VectorExpressions.cosine(col("a"), col("b")).as("cos"),
      VectorExpressions.simhash64(col("toks")).as("sh"),
      VectorExpressions.polySimhash(col("toks")).as("psh"),
      MinHash.signature(col("toks"), 2, 16).as("sig"),
      MinHash.signature(col("toks"), 2, 16, portable = true).as("sigp"),
      MinHash.bandBuckets(col("toks"), 2, 16, 4, portable = true).as("bands"),
      VectorExpressions.rollingFingerprints(col("text"), 4, 2).as("fps"),
      ExactDecimal.scaled6(col("x")).as("sl"),
      VectorExpressions.hornerHash(col("text")).as("ph"),
      graft.functions.TextNorm.nfcNormalize(col("text")).as("nt")).head()

    assert(viaSql.toSeq.map(String.valueOf) == viaApi.toSeq.map(String.valueOf),
      s"SQL and column API must agree:\n$viaSql\n$viaApi")
    assert(viaSql.getLong(7) == 12345000L)
  }

  test("arity and literal-argument violations fail at analysis with the function name") {
    GraftExtensions.register(spark)
    val e1 = intercept[Exception](spark.sql("SELECT cosine_similarity(array(1.0))").collect())
    assert(e1.getMessage.contains("cosine_similarity"))
    val e2 = intercept[Exception](
      spark.sql("SELECT minhash_signature(array('a','b'), 2, 'wide')").collect())
    assert(e2.getMessage.contains("minhash_signature"))
  }

  test("the SparkSessionExtensions construction hook registers the functions") {
    val prev = spark // keep the shared session to restore
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        "SELECT cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").head()
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }
}
