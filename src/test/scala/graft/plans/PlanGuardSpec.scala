package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The plan-shape regression guard: the deliberate-regression proof
  * (a 2^rounds self-join plan MUST trip it — the r14 k-core bug class)
  * plus the bookkeeping contracts. */
class PlanGuardSpec extends SparkSpec {
  import spark.implicits._

  test("deliberate regression: the k-core-style double-reference loop " +
      "trips the guard, the fixed single-reference loop does not") {
    val base = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    // BUGGY shape (the r14 find): each round references the
    // accumulating frame twice — 2^rounds plan nodes
    var buggy = base
    for (_ <- 1 to 4)
      buggy = buggy.join(buggy.select($"src".as("s2")), $"src" === $"s2",
        "left_semi")
    // FIXED shape: one reference per round — linear plan growth
    var fixed = base
    for (_ <- 1 to 4)
      fixed = fixed.filter($"src" >= 0L)
    val baseline = Map("q_loop" -> PlanGuard.nodeCount(base))
    val violations = PlanGuard.check(
      Map("q_loop" -> PlanGuard.nodeCount(buggy)), baseline)
    assert(violations.size === 1 && violations.head.startsWith("q_loop:"))
    assert(PlanGuard.check(
      Map("q_loop" -> PlanGuard.nodeCount(fixed)), baseline).isEmpty)
  }

  test("stream-side projection hazard: a signature expression projected " +
      "on the streamed side of a broadcast join trips the pin; the " +
      "materialized (localCheckpoint) form passes — the r8-LUT/r17-encode " +
      "bug class, round-18 pin") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val dim = spark.range(0, 500).select($"id".as("doc_id"),
      lit("x").as("tag"))
    val sigs = docs.select($"doc_id",
      graft.functions.GraftFunctions.minhash_md5_signature(
        $"text", 2, 16).as("sig"))
    // DELIBERATE regression: the expensive projection stays a deferred
    // expression on the streamed side of the join — whole-stage
    // codegen re-evaluates it per matched pair
    val buggy = sigs.join(broadcast(dim), "doc_id")
    buggy.collect()
    val v = PlanGuard.streamSideHazards(buggy.queryExecution.executedPlan)
    assert(v.nonEmpty && v.head.contains("MinHashMd5Signature"), v)
    // the documented fix: signatures as DATA (bounded rows
    // materialized) before the join — the deferral chain is cut
    val fixed = sigs.localCheckpoint(true).join(broadcast(dim), "doc_id")
    fixed.collect()
    assert(PlanGuard.streamSideHazards(
      fixed.queryExecution.executedPlan).isEmpty)
    // and a projection BELOW an exchange (its own codegen stage) is
    // not a hazard: the shuffle materializes the projected rows
    val shuffled = sigs.repartition($"doc_id").join(broadcast(dim), "doc_id")
    shuffled.collect()
    assert(PlanGuard.streamSideHazards(
      shuffled.queryExecution.executedPlan).isEmpty)
  }

  test("check: >2x fails, <=2x passes, new queries and missing " +
      "baselines never violate") {
    val baseline = Map("a" -> 10, "b" -> 10)
    assert(PlanGuard.check(Map("a" -> 21), baseline).size === 1)
    assert(PlanGuard.check(Map("a" -> 20), baseline).isEmpty)
    assert(PlanGuard.check(Map("new_query" -> 500), baseline).isEmpty)
  }

  test("render/parseBaseline round-trip") {
    val counts = Map("q01" -> 7, "q218_curation_pipeline" -> 123)
    assert(PlanGuard.parseBaseline(PlanGuard.render(counts)) === counts)
    assert(PlanGuard.loadBaseline("/nonexistent/plan.json") === Map.empty)
  }

  test("nodeCount counts subquery plans (a regression hiding inside a " +
      "scalar subquery still registers)") {
    val t = Seq(1L, 2L, 3L).toDF("v")
    t.createOrReplaceTempView("plan_guard_t")
    val plain = spark.sql("SELECT v FROM plan_guard_t")
    val withSub = spark.sql(
      "SELECT v FROM plan_guard_t WHERE v > (SELECT avg(v) FROM plan_guard_t)")
    assert(PlanGuard.nodeCount(withSub) > PlanGuard.nodeCount(plain))
  }
}
