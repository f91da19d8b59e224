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

  test("every registered custom function resolves in SQL") {
    val spark = GraftSession.getOrCreate("local[2]")
    val r = spark.sql(
      """SELECT
        |  tokens_in_set('the cat the', array('the')) AS t,
        |  ngrams_in_set('the cat', array('the', 'cat')) AS n,
        |  size(minhash_signature(hashed_shingles('a b c', 2), 8)) AS m,
        |  size(hashed_shingles('a b c d', 2)) AS h
        |""".stripMargin).collect()(0)
    assert(r.getInt(0) === 2)
    assert(r.getInt(1) === 2)
    assert(r.getInt(2) === 8)
    assert(r.getInt(3) === 3)
    // the aggregate registers too
    import spark.implicits._
    val agg = Seq(1L, 2L, 3L).toDF("v")
    agg.createOrReplaceTempView("rs_v")
    assert(spark.sql("SELECT size(reservoir_sample(v, 2)) FROM rs_v")
      .collect()(0).getInt(0) === 2)
  }
}
