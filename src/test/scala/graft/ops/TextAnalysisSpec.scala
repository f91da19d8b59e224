package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount counts whitespace tokens") {
    val got = Seq("a b c", "single").toDF("t")
      .select(TextAnalysis.tokenCount($"t")).as[Int].collect().toSeq
    assert(got === Seq(3, 1))
  }

  test("bpeishTokenCount splits runs of letters/digits/punct") {
    val got = Seq("abc123 def!").toDF("t")
      .select(TextAnalysis.bpeishTokenCount($"t")).as[Int].collect()(0)
    // abc, 123, def, !
    assert(got === 4)
  }

  test("langId picks the profile with most marker hits, und on no hits") {
    val got = Seq(
      "the cat is on the mat and a dog",
      "el gato y la casa de que en",
      "der hund und die katze ist ein",
      "zzz qqq xxx").toDF("t")
      .select(TextAnalysis.langId($"t")).as[String].collect().toSeq
    assert(got === Seq("en", "es", "de", "und"))
  }

  test("langIdCharNgram: trigram profiles pick the language, und on none") {
    val got = Seq(
      "the weather is changing and interesting",
      "aquellos que hablado los nacion",
      "der schnelle reiche einfache",
      "zz qq xx").toDF("t")
      .select(TextAnalysis.langIdCharNgram($"t")).as[String].collect().toSeq
    assert(got(0) === "en")
    assert(got(1) === "es")
    assert(got(2) === "de")
    assert(got(3) === "und")
  }

  test("qualityColumns ratios are consistent") {
    val row = Seq("the quick fox! a b").toDF("t")
      .select(TextAnalysis.qualityColumns($"t").map { case (n, c) => c.as(n) }: _*)
      .collect()(0)
    assert(row.getAs[Int]("n_chars") === 18)
    assert(row.getAs[Int]("n_tokens") === 5)
    assert(row.getAs[Double]("stop_ratio") === 0.4) // "the","a" of 5
  }

  test("fingerprint is order-sensitive and deterministic") {
    val fps = Seq("a b c", "c b a", "a b c").toDF("t")
      .select(TextAnalysis.fingerprint($"t")).as[Long].collect()
    assert(fps(0) === fps(2))
    assert(fps(0) !== fps(1))
  }
}
