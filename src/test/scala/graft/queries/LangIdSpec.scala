package graft.queries

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** The registered q31 can only certify determinism (the synthetic fixture
  * shares one vocabulary across langs); accuracy of the stopword-profile
  * heuristic is proven here on natural sentences.
  */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  test("langPredict identifies natural sentences in all five languages") {
    val samples = Seq(
      ("the quick brown fox is a friend of the dog and it runs to the park", "en"),
      ("der hund und die katze ist ein freund und das haus hat der garten", "de"),
      ("el perro y la casa de los amigos es un lugar y el sol", "es"),
      ("le chien et la maison les amis est un lieu et le soleil de paris", "fr"),
      ("我 在 家 的 时候 是 了 好 的 天", "zh"))
    val got = samples.toDF("text", "lang")
      .select(col("lang"), LlmOps.langPredict(col("text")).as("pred"))
      .as[(String, String)].collect().toSeq
    got.foreach { case (lang, pred) => assert(pred == lang, s"expected $lang got $pred") }
  }

  test("langPredict is case-insensitive and ties break deterministically") {
    val caps = Seq("THE Dog IS A Friend OF THE Cat").toDF("text")
      .select(LlmOps.langPredict(col("text"))).as[String].head()
    assert(caps == "en")
    // no profile hits at all -> en wins every >= comparison at score 0
    val none = Seq("xyzzy plugh grault").toDF("text")
      .select(LlmOps.langPredict(col("text"))).as[String].head()
    assert(none == "en")
  }
}
