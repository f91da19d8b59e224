package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference of [[Graph.pageRankFp]]'s exact integer
    * semantics, independent code path (Map/fold, no Spark). */
  private def referencePr(edges: Seq[(Long, Long)], iters: Int,
      scale: Long = 1000000000000L): Map[Long, Long] = {
    val es = edges.distinct
    val deg = es.groupBy(_._1).map { case (s, g) => s -> g.size.toLong }
    val n = deg.size.toLong
    val init = scale / n
    val base = (3L * scale) / (20L * n)
    var r = deg.keys.map(_ -> init).toMap
    for (_ <- 1 to iters) {
      val contrib = es.groupBy(_._2).map { case (d, g) =>
        d -> g.map { case (s, _) => (17L * r(s)) / (20L * deg(s)) }.sum
      }
      r = deg.keys.map(v => v -> (base + contrib.getOrElse(v, 0L))).toMap
    }
    r
  }

  // path graph 1-2-3 symmetrized: 2 is the hub
  private val pathEdges =
    Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))

  test("pageRankFp matches the driver-side integer reference on a path graph") {
    val got = Graph.pageRankFp(pathEdges.toDF("src", "dst"), "src", "dst", iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = referencePr(pathEdges, 4)
    assert(got.map(t => t._1 -> t._2).toMap === want)
    assert(got.map(t => t._1 -> t._3).toMap === Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
    // the hub outranks the leaves; leaves tie exactly (integer arithmetic)
    val byNode = got.map(t => t._1 -> t._2).toMap
    assert(byNode(2L) > byNode(1L) && byNode(1L) === byNode(3L))
  }

  test("pageRankFp is insensitive to duplicate edges and edge order") {
    val dup = (pathEdges ++ pathEdges ++ pathEdges.reverse).toDF("src", "dst")
    val a = Graph.pageRankFp(dup, "src", "dst", iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = referencePr(pathEdges, 3)
    assert(a === b)
  }

  test("pageRankFp on a star graph: contributions into a non-src node are dropped") {
    // 9 -> {1,2}, symmetric only for node 1: node 2 has no out-edges,
    // so it is NOT in the node set and its rank is undefined
    val edges = Seq((9L, 1L), (9L, 2L), (1L, 9L)).toDF("src", "dst")
    val got = Graph.pageRankFp(edges, "src", "dst", iters = 2)
      .select("node").as[Long].collect().toSet
    assert(got === Set(1L, 9L))
  }

  test("pageRankFp total mass stays within truncation slack of scale") {
    val scale = 1000000000000L
    val r = referencePr(pathEdges, 8, scale)
    val total = r.values.sum
    // each of the n nodes loses < 1 unit per division + base truncation
    assert(total <= scale && total >= scale - 100L * r.size)
    val spark2 = Graph.pageRankFp(pathEdges.toDF("src", "dst"), "src", "dst", iters = 8)
      .agg(sum("rank_fp")).as[Long].collect()(0)
    assert(spark2 === total)
  }

  test("pageRankFp refuses a scale where dampNum * rank could overflow 64 bits") {
    intercept[IllegalArgumentException] {
      Graph.pageRankFp(pathEdges.toDF("src", "dst"), "src", "dst",
        iters = 1, scale = Long.MaxValue / 2)
    }
  }
}
