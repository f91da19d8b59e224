package graft.plans

import org.apache.spark.sql.DataFrame

/** Plan-SHAPE regression guard (round-15, the round-14 verdict's #5
  * ask). The r14 k-core find proved the class: a loop that referenced
  * its accumulating frame twice doubled the LOGICAL plan per round —
  * 2^cadence nodes — and at bench SF the walls looked fine; only a
  * deep-iteration run exposed Catalyst grinding for an hour on a 60k-
  * edge graph. Plan pathologies ship silently where timings cannot
  * catch them, so the standing sweep records every registered query's
  * optimized-plan node count and fails when a count grows more than
  * [[GrowthLimit]]× over the committed baseline (`PLAN_SIZES.json`)
  * without a registered exception.
  *
  * Workflow: [[graft.Bench]] prints the per-query counts in its detail
  * line and writes `target/plan_sizes_current.json`; a deliberate plan
  * change is "registered" by refreshing the committed baseline in the
  * same commit (or, for a query whose plan is legitimately
  * input-shaped, an entry in [[Exceptions]] naming why). Counts are a
  * pure function of the code + catalog state — no timing noise — so
  * any unexplained growth is a real structural change.
  */
object PlanGuard {

  /** Fail line: current > GrowthLimit × baseline. 2× catches every
    * doubling-per-iteration bug after ONE extra doubling while never
    * tripping on an added filter or column. */
  val GrowthLimit = 2.0

  /** Queries whose plan size is allowed to drift without refreshing
    * the baseline, each with the reason on record. Empty today — the
    * registry's plans are all structurally pinned. */
  val Exceptions: Map[String, String] = Map.empty

  /** Optimized-plan node count, subqueries included (a regression that
    * hides inside a scalar subquery still counts). localCheckpointed
    * segments appear as single opaque RDD-scan leaves — that is the
    * point: the guard measures the plan Catalyst actually optimizes. */
  def nodeCount(df: DataFrame): Int = {
    val plan = df.queryExecution.optimizedPlan
    plan.collectWithSubqueries { case _ => 1 }.sum
  }

  /** Violation messages for every query whose current count exceeds
    * GrowthLimit × its baseline and is not excepted. Queries absent
    * from the baseline (new this round) never violate — they enter the
    * baseline at the round snapshot. */
  def check(current: Map[String, Int],
            baseline: Map[String, Int]): Seq[String] =
    current.toSeq.sorted.flatMap { case (name, n) =>
      baseline.get(name) match {
        case Some(b) if n > GrowthLimit * b && !Exceptions.contains(name) =>
          Some(s"$name: optimized plan grew ${b} -> ${n} nodes " +
            s"(> ${GrowthLimit}x) — register the change by refreshing " +
            "PLAN_SIZES.json in this commit or adding a PlanGuard " +
            "exception with the reason")
        case _ => None
      }
    }

  /** Parse the flat {"name": count} JSON baseline (no external JSON
    * dep in main; the format is machine-written by Bench). */
  def parseBaseline(text: String): Map[String, Int] =
    """"([^"]+)"\s*:\s*(\d+)""".r.findAllMatchIn(text)
      .map(m => m.group(1) -> m.group(2).toInt).toMap

  def loadBaseline(path: String): Map[String, Int] = {
    val f = new java.io.File(path)
    if (!f.exists()) Map.empty
    else parseBaseline(
      new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8))
  }

  def render(counts: Map[String, Int]): String =
    counts.toSeq.sorted.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
}
