package graft

import graft.sources.Tables
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** In-flight data-quality metrics via Dataset.observe: aggregate
  * counters computed DURING the main action — no second scan. At
  * 100 TB a separate metrics pass doubles the read; observe rides the
  * existing one (the production data-quality pattern for pipelines). */
class ObservationSpec extends SparkSpec {

  test("observe collects row/null/sum counters during the main action") {
    // Isolated child session: a live Observation makes the owning
    // session's ObservationManager non-serializable, and suites run in
    // parallel in this JVM — an MLlib fit in another suite would fail
    // closure serialization if it captured the shared session while
    // this observation is registered.
    val session = spark.newSession()
    val obs = Observation("quality")
    val li = Tables.lineitem(session, sf0001)
      .observe(obs,
        count(lit(1)).as("rows_seen"),
        sum(when(col("l_quantity").isNull, 1L).otherwise(0L)).as("null_qty"),
        max(col("l_quantity")).as("max_qty"))
    val n = li.filter(col("l_quantity") > 25).count() // the real action

    val m = obs.get
    assert(m("rows_seen").asInstanceOf[Long] == Tables.lineitem(session, sf0001).count())
    assert(m("null_qty").asInstanceOf[Long] == 0L)
    assert(m("max_qty").asInstanceOf[Double] >= 25.0)
    assert(n > 0)
  }
}
