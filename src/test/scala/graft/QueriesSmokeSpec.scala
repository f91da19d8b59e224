package graft

/** Every registered query must RUN — the oracle gate checks values,
  * this catches runtime regressions (analysis errors, missing
  * columns, codegen failures) inside `sbt test` without the driver.
  * Loan/ML queries are exercised by LoanPipelineSpec (a fit per query
  * here would dominate suite time), so they're skipped. */
class QueriesSmokeSpec extends SparkSpec {

  test("oracle registry is a subset of the query registry") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  private val skip = Set(
    "q30_loan_pipeline_metrics", "q31_loan_score_override",
    "q34_loan_zscore_metrics") // each is a full MLlib fit; covered in LoanPipelineSpec

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    if (!skip(name)) {
      test(s"$name runs at sf0.001") {
        val df = fn(spark, sf0001)
        assert(df.columns.nonEmpty)
        df.count() // materialize; throws on any runtime failure
      }
    }
  }
}
