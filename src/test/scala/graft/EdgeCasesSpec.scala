package graft

import graft.ops.{AsOf, Dedup, Relational}
import org.apache.spark.sql.functions._

/** Empty and degenerate inputs must flow through every operator
  * without crashing — at 100 TB a filter that matches nothing in one
  * partition of one table is an everyday event, not an edge case. */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("dedup pipelines on empty input yield empty output") {
    assert(Dedup.exactDedup(emptyDocs, "text", "doc_id").count() === 0)
    assert(Dedup.minhashDedupPairs(emptyDocs, "text", "doc_id",
      shingleK = 2, numHashes = 16, bands = 4).count() === 0)
    assert(Dedup.simhashDedupPairs(emptyDocs, "text", "doc_id").count() === 0)
  }

  test("topKPerGroup on empty input yields empty output") {
    val empty = Seq.empty[(Long, Double)].toDF("k", "score")
    assert(graft.plans.TopKPerGroup
      .topKPerGroup(empty, Seq("k"), "score", 3).count() === 0)
  }

  test("asOfJoin with an empty right side keeps all left rows, null payloads") {
    val l = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "e"))
      .toDF("k", "ts", "ev")
    val r = Seq.empty[(Long, java.sql.Timestamp, String, Double)]
      .toDF("k", "ts", "pid", "pval")
    val out = AsOf.asOfJoin(l, r, Seq("k"), "ts", "ts", Seq("pid", "pval"))
    assert(out.count() === 1)
    assert(out.select("asof_pid").collect()(0).isNullAt(0))
  }

  test("forwardFill and meanFillAgg on all-null columns stay null / empty-safe") {
    val allNull = Seq((1, 1, None: Option[Double]), (1, 2, None))
      .toDF("k", "o", "v")
    val ff = Relational.forwardFill(allNull, "v", Seq("k"), Seq(col("o")))
    assert(ff.filter(col("v").isNotNull).count() === 0)
    val mf = Relational.meanFillAgg(allNull, Seq("v"))
    assert(mf.count() === 2) // mean of nothing -> null fill, rows survive
  }

  test("registerAll exposes the whole catalog to the SQL front end") {
    graft.sources.Tables.registerAll(spark, sf0001)
    val n = spark.sql(
      """SELECT count(*) FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey""".stripMargin)
      .collect()(0).getLong(0)
    assert(n > 0)
    assert(spark.sql("SELECT count(*) FROM events WHERE value > 0")
      .collect()(0).getLong(0) > 0) // nanos-normalized reader used
  }
}
