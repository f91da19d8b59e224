package graft

import graft.queries.{AdvancedQueries, CoreQueries}
import org.apache.spark.sql.DataFrame

/** Plan-shape regressions are silent perf bugs at 100 TB: a filter
  * that stops reaching the scan or a dimension join that stops
  * broadcasting still returns correct rows. These tests pin the plan
  * properties the scale story depends on. */
class PlanQualitySpec extends SparkSpec {

  private def executed(df: DataFrame): String = {
    df.collect() // finalize adaptive plan
    df.queryExecution.executedPlan.toString
  }

  test("q02: filters and column pruning reach the parquet scan") {
    val plan = executed(CoreQueries.q02FilterProject.fn(spark, sf0001))
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity)") ||
      plan.contains("GreaterThan(l_quantity,45.0)"), plan.take(400))
    assert(plan.contains("ReadSchema"))
    // pruned: the 11-column lineitem scan must NOT read l_returnflag
    assert(!plan.split("ReadSchema")(1).takeWhile(_ != '\n').contains("l_returnflag"))
  }

  test("q03: dimension joins broadcast (no shuffle join for nation/region)") {
    val plan = executed(CoreQueries.q03JoinAgg.fn(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"), plan.take(400))
    assert(!plan.contains("CartesianProduct"))
  }

  test("q56: the range join is a hash join on bins, not a nested loop") {
    val plan = executed(AdvancedQueries.q56RangeJoin.fn(spark, sf0001))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
    assert(!plan.contains("CartesianProduct"))
  }

  test("the as-of join operator pays exactly one shuffle on the key") {
    import org.apache.spark.sql.functions.col
    // the raw operator, without the oracle-facing global ORDER BY the
    // q42 query adds (that sort is its own, separate exchange)
    val ev = graft.sources.Tables.events(spark, sf0001)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("p_event"), col("value").as("p_value"))
    val df = graft.ops.AsOf.asOfJoin(errors, purchases, Seq("user_id"),
      "ts", "ts", Seq("p_event", "p_value"), tiebreak = Some("p_event"))
    df.collect()
    // AdaptiveSparkPlan.toString prints BOTH the final and the initial
    // plan; count exchanges in the final section only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // each materialized AQE stage prints as ShuffleQueryStage wrapping
    // its Exchange — counting "Exchange " alone counts each shuffle once
    val exchanges = "Exchange ".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 key shuffle, got $exchanges:\n${plan.take(800)}")
  }
}
