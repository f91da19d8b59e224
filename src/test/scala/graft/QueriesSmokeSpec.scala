package graft

/** Every registered query must RUN — the oracle gate checks values,
  * this catches runtime regressions (analysis errors, missing
  * columns, codegen failures) inside `sbt test` without the driver.
  * Loan/ML queries are exercised by LoanPipelineSpec (a fit per query
  * here would dominate suite time), so they're skipped. */
class QueriesSmokeSpec extends SparkSpec {

  test("testdata conforms to the schema contract at every SF") {
    for (dir <- Seq(sf0001, sf001))
      assert(graft.sources.TestdataContract.diff(spark, dir).isEmpty)
  }

  test("a deliberate schema perturbation yields ONE named diff") {
    // write a copy of events with ts re-encoded as epoch millis long —
    // the drift class that broke round 7, but a type the contract
    // does NOT accept undetected: long is only legal for the legacy
    // nanos read, which this perturbation is not claiming. We assert
    // the diff names the exact table.column rather than 17 queries
    // exploding downstream.
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("contract_perturb")
    graft.sources.Tables.allTables.foreach { t =>
      val df = spark.read.parquet(s"$sf0001/$t.parquet")
      val out =
        if (t == "events") df.withColumn("ts", col("ts").cast("string"))
        else df
      out.coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val d = graft.sources.TestdataContract.diff(spark, dir.toString)
    assert(d.size == 1, s"expected exactly one diff, got: $d")
    assert(d.head.startsWith("events.ts:"), d.head)
  }

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
