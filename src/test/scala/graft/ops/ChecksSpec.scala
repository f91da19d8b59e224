package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  // own session: a live Observation makes the owning session
  // non-serializable for concurrently-running MLlib suites
  private lazy val session = spark.newSession()

  test("expectations count violations during the main action") {
    import session.implicits._
    val df = Seq((1, 10.0), (2, -5.0), (3, 2000.0), (4, 50.0))
      .toDF("id", "qty")
    val (observed, obs) = Checks.expect(df,
      "qty_nonnegative" -> (col("qty") >= 0),
      "qty_below_1000" -> (col("qty") < 1000))
    val n = observed.filter(col("qty") > 0).count() // the real action
    assert(n === 3)
    val v = Checks.violations(obs)
    assert(v("qty_nonnegative") === 1) // the -5.0 row
    assert(v("qty_below_1000") === 1)  // the 2000.0 row
    assert(v("__rows") === 4)
    intercept[IllegalStateException] { Checks.assertClean(obs) }
  }

  test("null predicate results count as violations") {
    import session.implicits._
    val df = Seq(Some(1.0), None, Some(-1.0)).toDF("v")
    val (observed, obs) = Checks.expect(df, "v_positive" -> (col("v") > 0))
    observed.count()
    assert(Checks.violations(obs)("v_positive") === 2) // null AND -1.0
  }
}
