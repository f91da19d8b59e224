package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Data-quality expectations that ride the main action via
  * `Dataset.observe` — violation counters cost ZERO extra scans
  * (at 100 TB a separate validation pass doubles the read).
  *
  * Usage:
  * {{{
  *   val (df, checks) = Checks.expect(input,
  *     "no_null_keys" -> col("id").isNotNull,
  *     "qty_in_range" -> col("qty").between(0, 1000))
  *   df.write.parquet(out)               // the real action
  *   val violations = Checks.violations(checks)  // Map(name -> count)
  * }}}
  */
object Checks {

  /** Attach named expectations to a DataFrame. Each predicate's
    * VIOLATION count (rows where it is false or null) is collected by
    * the first action on the returned frame. */
  def expect(df: DataFrame, expectations: (String, Column)*)
      : (DataFrame, Observation) = {
    require(expectations.nonEmpty, "at least one expectation required")
    val obs = Observation()
    val counters = expectations.map { case (name, pred) =>
      sum(when(pred, 0L).otherwise(1L)).as(name)
    } :+ count(lit(1)).as("__rows")
    (df.observe(obs, counters.head, counters.tail: _*), obs)
  }

  /** Violation counts per expectation (blocks until the observed
    * frame's first action completes), plus "__rows" = total rows. */
  def violations(obs: Observation): Map[String, Long] =
    obs.get.map { case (k, v) => k -> v.asInstanceOf[Long] }

  /** Fail-fast variant: throws if any expectation was violated —
    * the CI-gate shape (run after the action). */
  def assertClean(obs: Observation): Unit = {
    val v = violations(obs).filter { case (k, n) => k != "__rows" && n > 0 }
    if (v.nonEmpty)
      throw new IllegalStateException(
        s"data-quality expectations violated: $v")
  }
}
