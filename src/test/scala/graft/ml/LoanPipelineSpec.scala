package graft.ml

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class LoanPipelineSpec extends SparkSpec {

  lazy val bundle: LoanPipeline.LoanModelBundle = LoanPipeline.train(spark)

  test("loan CSV reads 999 rows with the pinned schema (S1)") {
    val df = Tables.loan(spark)
    assert(df.count() === 999)
    assert(df.schema === Tables.loanSchema)
    // inferSchema parity path yields the same schema (SURVEY §1.2)
    val inferred = Tables.loan(spark, inferSchema = true)
    assert(inferred.schema.map(f => (f.name, f.dataType)) ===
      Tables.loanSchema.map(f => (f.name, f.dataType)))
  }

  test("pipeline trains end-to-end; metrics within reference tolerance (M1-M7, A4, A5)") {
    // Majority-class floor is 0.741 (BASELINE.md); LR should be at or
    // above it, and AUC well above chance.
    assert(bundle.auc > 0.60 && bundle.auc <= 1.0)
    assert(bundle.accuracy > 0.70 && bundle.accuracy <= 1.0)
    assert(bundle.trainCount + bundle.testCount === 999)
  }

  test("imputer output has no nulls in the 4 imputed columns (M1)") {
    val prep = bundle.model.stages(0)
    val out = prep.transform(Tables.loan(spark))
    Tables.loanImputeCols.foreach { c =>
      assert(out.filter(col(s"${c}_imp").isNull).count() === 0,
        s"nulls left in ${c}_imp")
    }
  }

  test("accuracy evaluator matches relational re-derivation (A5)") {
    val df = Tables.loan(spark)
    val scored = bundle.model.transform(df)
    val acc = LoanPipeline.accuracy(scored)
    val rel = scored.agg(
      avg(when(col("prediction") === col("Status").cast("double"), 1.0)
        .otherwise(0.0))).collect()(0).getDouble(0)
    assert(math.abs(acc - rel) < 1e-9)
  }

  test("override forces rejection regardless of model output (M10+P6+P7)") {
    import LoanPipeline.LoanInput
    val got = LoanPipeline.scoreInputs(spark, bundle.model, Seq(
      LoanInput(250000, 4.0, 90000, 25000, 700, 80.0),
      LoanPipeline.DefaultInput))
      .select(col("loan_amount"), col("prediction_final"), col("decision"))
      .collect().map(r => r.getInt(0) -> ((r.getDouble(1), r.getString(2)))).toMap
    val (pred, decision) = got(250000)
    assert(pred === 0.0)
    assert(decision === "rejected")
  }

  test("model save/load roundtrip preserves predictions (S4/S5)") {
    val dir = java.nio.file.Files.createTempDirectory("loanmodel").toString
    LoanPipeline.save(bundle.model, dir)
    val loaded = LoanPipeline.load(dir)
    val df = Tables.loan(spark).limit(50)
    val a = bundle.model.transform(df).select("ID", "prediction")
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq.sorted
    val b = loaded.transform(df).select("ID", "prediction")
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq.sorted
    assert(a === b)
  }

  test("corrected mode (fit prep on train only) also trains green") {
    val b = LoanPipeline.train(spark, fitPrepOnTrainOnly = true)
    assert(b.auc > 0.55)
    assert(b.accuracy > 0.65)
  }
}
