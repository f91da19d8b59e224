package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class BucketingSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(name).toString

  test("same-bucket join plans with ZERO shuffle exchanges") {
    val base = tmp("bkt_join")
    Bucketing.writeBucketedTable(
      Tables.orders(spark, sf0001).select(col("o_orderkey"), col("o_orderpriority")),
      table = "t_bkt_orders", path = s"$base/orders",
      bucketCols = Seq("o_orderkey"), numBuckets = 4,
      sortCols = Seq("o_orderkey"))
    Bucketing.writeBucketedTable(
      Tables.lineitem(spark, sf0001).select(col("l_orderkey"), col("l_quantity")),
      table = "t_bkt_lineitem", path = s"$base/lineitem",
      bucketCols = Seq("l_orderkey"), numBuckets = 4,
      sortCols = Seq("l_orderkey"))
    val joined = Bucketing.table(spark, "t_bkt_orders")
      .join(Bucketing.table(spark, "t_bkt_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
    val n = joined.count()
    assert(n > 0)
    val shuffles = flattenPlan(joined.queryExecution.executedPlan).collect {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.isEmpty,
      s"bucketed join must not exchange, found:\n${shuffles.mkString("\n")}")
  }

  test("bucketed join results equal the plain (shuffled) join") {
    // tables registered by the previous test; re-register to be
    // order-independent
    val base = tmp("bkt_eq")
    val orders = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val lineitem = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_quantity"))
    Bucketing.writeBucketedTable(orders, "t_bkt_eq_o", s"$base/o",
      Seq("o_orderkey"), 4, Seq("o_orderkey"))
    Bucketing.writeBucketedTable(lineitem, "t_bkt_eq_l", s"$base/l",
      Seq("l_orderkey"), 4, Seq("l_orderkey"))
    val bucketed = Bucketing.table(spark, "t_bkt_eq_o")
      .join(Bucketing.table(spark, "t_bkt_eq_l"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(28,2)")).as("q"))
      .orderBy(col("o_orderpriority"))
      .collect().toSeq
    val plain = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(28,2)")).as("q"))
      .orderBy(col("o_orderpriority"))
      .collect().toSeq
    assert(bucketed === plain)
  }

  test("overwrite re-registration is idempotent (bench runs 3x)") {
    val base = tmp("bkt_rerun")
    val df = Tables.region(spark, sf0001)
    Bucketing.writeBucketedTable(df, "t_bkt_rerun", s"$base/r",
      Seq("r_regionkey"), 2)
    Bucketing.writeBucketedTable(df, "t_bkt_rerun", s"$base/r",
      Seq("r_regionkey"), 2)
    assert(Bucketing.table(spark, "t_bkt_rerun").count() === df.count())
  }
}
