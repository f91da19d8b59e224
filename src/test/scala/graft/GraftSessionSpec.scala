package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftSessionSpec extends AnyFunSuite {

  test("GraftSession configures AQE/skew/UTC and resolves custom SQL functions") {
    val spark = GraftSession.getOrCreate("local[2]")
    // getOrCreate may reuse the suite-wide session; register() makes the
    // function surface available either way
    assert(spark.sql("SELECT cosine_sim(array(3.0d, 0.0d), array(7.0d, 0.0d))")
      .collect()(0).getDouble(0) === 1.0)
    // on a fresh session these configs come from the builder; on a
    // reused one the call is still required to be harmless
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
  }
}
