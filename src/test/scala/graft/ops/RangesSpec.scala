package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangesSpec extends SparkSpec {
  import spark.implicits._

  test("binnedRangeJoin equals the naive interval join") {
    val points = (0 until 500).map(i => (i.toLong, i * 0.7)).toDF("pid", "v")
    val intervals = Seq(
      (1L, 10.0, 20.0), (2L, 15.5, 16.5), (3L, 300.0, 349.9),
      (4L, -50.0, -40.0), (5L, 348.0, 10000.0))
      .toDF("iid", "lo", "hi")

    val naive = points.join(intervals,
      $"v" >= $"lo" && $"v" <= $"hi")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val binned = Ranges.binnedRangeJoin(points, "v", intervals, "lo", "hi", 25.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned === naive)
    assert(naive.nonEmpty)
  }

  test("binnedRangeJoin plans an equality shuffle join, not nested-loop") {
    val points = spark.range(100).toDF("pid").withColumn("v", $"pid" * 1.0)
    val intervals = spark.range(10).toDF("iid")
      .withColumn("lo", $"iid" * 10.0).withColumn("hi", $"iid" * 10.0 + 9.0)
    val plan = Ranges.binnedRangeJoin(points, "v", intervals, "lo", "hi", 10.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
  }
}
