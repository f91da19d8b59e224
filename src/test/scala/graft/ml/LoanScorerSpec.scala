package graft.ml

import graft.SparkSpec
import graft.ml.LoanPipeline.LoanInput
import org.apache.spark.sql.functions._

class LoanScorerSpec extends SparkSpec {

  lazy val bundle = LoanPipeline.trainCached(spark)
  lazy val scorer = LoanScorer.fromModel(bundle.model)

  test("local scorer matches PipelineModel.transform on a grid of inputs") {
    val grid = for {
      loan <- Seq(50000, 250000, 900000)
      rate <- Seq(2.8, 4.0, 5.7)
      prop <- Seq(90000, 400000, 2000000)
      income <- Seq(1000, 25000, 70000)
    } yield LoanInput(loan, rate, prop, income, 700, 75.0)

    val viaSpark = LoanPipeline.scoreInputs(spark, bundle.model, grid)
      .select(col("loan_amount"), col("rate_of_interest"),
        col("property_value"), col("income"), col("prediction"))
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getInt(2), r.getInt(3)) ->
        r.getDouble(4)).toMap

    grid.foreach { in =>
      val local = scorer.predict(in)
      val sparkPred = viaSpark(
        (in.loan_amount, in.rate_of_interest, in.property_value, in.income))
      assert(local === sparkPred, s"mismatch for $in")
    }
  }

  test("decide applies the override and labels like the pipeline path") {
    val (p, label) = scorer.decide(LoanInput(250000, 4.0, 90000, 25000, 700, 80.0))
    assert(p === 0.0)
    assert(label === "rejected")
  }

  test("local scoring is driver-local fast (no Spark jobs)") {
    val in = LoanPipeline.DefaultInput
    scorer.predict(in) // warm
    val t0 = System.nanoTime()
    var i = 0
    while (i < 10000) { scorer.predict(in); i += 1 }
    val perCallMicros = (System.nanoTime() - t0) / 10000 / 1000.0
    // generous bound: must be far below any Spark-job latency
    assert(perCallMicros < 1000.0, s"$perCallMicros us per call")
  }
}
