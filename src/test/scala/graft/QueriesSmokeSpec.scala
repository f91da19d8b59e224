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

  // Round-18 (the r17 verdict's #3 ask): screen EVERY executed plan of
  // every registered query for the stream-side projection codegen
  // hazard (the r8-LUT/r17-encode bug class — an expensive projection
  // deferred into a join's matched-row loop). The listener sees every
  // plan the smoke run executes, including the internal jobs of
  // sidecar/index builders; the assertion runs as the suite's last
  // test, after the async listener bus has drained.
  @volatile private var currentQuery: String = "<setup>"
  private val hazardViolations =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private val hazardListener =
    new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          ns: Long): Unit =
        graft.plans.PlanGuard.streamSideHazards(qe.executedPlan)
          .foreach(v => { hazardViolations.add(s"[$currentQuery] $v"); () })
      override def onFailure(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
  spark.listenerManager.register(hazardListener)

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    if (!skip(name)) {
      test(s"$name runs at sf0.001") {
        currentQuery = name
        val df = fn(spark, sf0001)
        assert(df.columns.nonEmpty)
        df.count() // materialize; throws on any runtime failure
      }
    }
  }

  test("zz: no registered query's executed plans carry the stream-side " +
      "projection hazard (PlanGuard.streamSideHazards over the whole " +
      "smoke sweep)") {
    currentQuery = "<final>"
    // listener delivery is async; let the bus drain
    var prev = -1
    while (prev != hazardViolations.size()) {
      prev = hazardViolations.size()
      Thread.sleep(500)
    }
    val vs = hazardViolations.toArray(Array.empty[String])
    assert(vs.isEmpty, vs.mkString("\n"))
  }
}
