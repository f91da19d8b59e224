package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics checks for the round-2 coverage batch. Exact
  * cross-engine equality is enforced by the DuckDB oracle gate; these
  * specs assert the properties the oracle can't see — plan shape
  * (partition pruning), agreement with Spark's built-in aggregates,
  * and salted-vs-plain join equivalence. */
class ExtendedQueriesSpec extends SparkSpec {

  test("q60 exact moments agree with Spark's built-in var_samp/stddev/corr") {
    val ours = ExtendedQueries.q60StatsMoments.fn(spark, sf001)
      .orderBy("l_returnflag").collect()
    val builtin = graft.sources.Tables.lineitem(spark, sf001)
      .groupBy(col("l_returnflag"))
      .agg(var_samp(col("l_quantity")).as("v"),
        stddev_samp(col("l_quantity")).as("s"),
        corr(col("l_quantity"), col("l_discount")).as("c"))
      .orderBy("l_returnflag").collect()
    ours.zip(builtin).foreach { case (o, b) =>
      assert(math.abs(o.getDouble(2) - b.getDouble(1)) < 1e-6)
      assert(math.abs(o.getDouble(3) - b.getDouble(2)) < 1e-8)
      assert(math.abs(o.getDouble(4) - b.getDouble(3)) < 1e-8)
    }
  }

  test("q61 percentiles bracket the group and are monotone") {
    val rows = ExtendedQueries.q61Percentiles.fn(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p90, p99) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(p50 <= p90 && p90 <= p99)
    }
  }

  test("q71 partitioned read prunes to one directory partition") {
    val df = ExtendedQueries.q71PartitionedParquet.fn(spark, sf0001)
    df.collect() // materialize (also writes the partitioned layout)
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("PartitionFilters"), "expected a partitioned scan")
    assert(scan.contains("o_orderpriority"),
      "partition filter on the partition column expected")
  }

  test("q72 salted join result equals the plain equi-join") {
    val salted = ExtendedQueries.q72SaltedJoin.fn(spark, sf0001)
      .orderBy("o_orderpriority").collect()
    val li = graft.sources.Tables.lineitem(spark, sf0001)
      .filter(col("l_quantity") < 10)
    val o = graft.sources.Tables.orders(spark, sf0001)
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        graft.ops.Relational.decSum(col("l_extendedprice")).as("sum_price"))
      .orderBy("o_orderpriority").collect()
    assert(salted.length == plain.length)
    salted.zip(plain).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      assert(a.getLong(1) == b.getLong(1))
      assert(a.getDouble(2) == b.getDouble(2)) // exact: decimal-routed
    }
  }

  test("q69/q70 sink round-trips are lossless at sf0.001") {
    assert(ExtendedQueries.q69CsvRoundtrip.fn(spark, sf0001).count() > 0)
    val json = ExtendedQueries.q70JsonRoundtrip.fn(spark, sf0001)
    val direct = graft.sources.Tables.events(spark, sf0001)
      .filter(col("user_id") < 50)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.ops.Relational.decSum(col("value")).as("sum_value"))
    assert(json.orderBy("event_type").collect()
      .sameElements(direct.orderBy("event_type").collect()))
  }

  test("q84 approx quantiles land near q61's exact percentiles") {
    val exact = ExtendedQueries.q61Percentiles.fn(spark, sf001)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val approx = ExtendedQueries.q84ApproxQuantiles.fn(spark, sf001).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val (p50, p90) = exact(r.getString(0))
      // 10000-bucket sketch on ~3k rows per group: near-exact
      assert(math.abs(r.getDouble(1) - p50) / p50 < 0.02)
      assert(math.abs(r.getDouble(2) - p90) / p90 < 0.02)
    }
  }

  test("q85 merge hint forces a sort-merge join over the broadcastable dim") {
    val df = ExtendedQueries.q85JoinHints.fn(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"hint ignored:\n${plan.take(600)}")
  }

  test("q92 heavy hitters agree with the exact top token counts") {
    val approx = graft.queries.DataQueries.q92HeavyHitters.fn(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.sources.Tables.documents(spark, sf001)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").count()
      .orderBy(col("count").desc, col("token"))
      .limit(10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every exact top-10 token appears among the 15 sketch hitters,
    // with a count within 5% (the sketch overestimates bounded by eps)
    exact.foreach { case (tok, n) =>
      assert(approx.contains(tok), s"missing hitter $tok")
      assert(math.abs(approx(tok) - n).toDouble / n < 0.05)
    }
  }

  test("q102 stratified sample: majority class down-sampled, minorities kept") {
    val totals = graft.sources.Tables.documents(spark, sf001)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = graft.queries.DataQueries.q102StratifiedSample.fn(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // en targeted at 20% (Bernoulli, so tolerance); others kept whole
    val enFrac = sampled("en").toDouble / totals("en")
    assert(enFrac > 0.1 && enFrac < 0.3, s"en fraction $enFrac")
    (totals.keySet - "en").foreach { l =>
      assert(sampled.getOrElse(l, 0L) === totals(l), s"stratum $l truncated")
    }
  }

  test("q67 window suite: rank fields consistent within each partition") {
    val rows = ExtendedQueries.q67WindowSuite.fn(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(1)).foreach { case (_, grp) =>
      val ranks = grp.map(_.getLong(2)).sorted
      assert(ranks.head == 1L, "each partition starts at rank 1")
      val pranks = grp.map(_.getDouble(5))
      assert(pranks.forall(p => p >= 0.0 && p <= 1.0))
    }
  }
}
