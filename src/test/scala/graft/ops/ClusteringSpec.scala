package graft.ops

import graft.SparkSpec
import graft.sources.Tables

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)],
                 nodes: Option[Seq[Long]] = None): Map[Long, Long] =
    Clustering.connectedComponents(
        edges.toDF("src", "dst"), "src", "dst",
        nodes.map(_.toDF("src")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("connectedComponents: path graph collapses to min label") {
    // 1-2-3-4-5 is a single component labelled 1, even though node 5
    // is 4 hops from the label source (exercises multiple iterations)
    val got = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("connectedComponents: disjoint components keep distinct labels") {
    val got = cc(Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L)))
    assert(got === Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("connectedComponents: direction and duplicate edges are irrelevant") {
    val got = cc(Seq((5L, 1L), (1L, 5L), (5L, 1L), (3L, 5L)))
    assert(got === Map(1L -> 1L, 3L -> 1L, 5L -> 1L))
  }

  test("connectedComponents: node universe adds singleton components") {
    val got = cc(Seq((1L, 2L)), nodes = Some(Seq(1L, 2L, 7L, 8L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 7L -> 7L, 8L -> 8L))
  }

  test("connectedComponents: distributed propagation and the gated local " +
      "finish produce identical labels") {
    // chain (multi-round propagation) + clique (contraction) + isolates
    val edges = (1L to 49L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (100L, 102L), (100L, 103L), (101L, 102L),
        (101L, 103L), (102L, 103L)) ++
      Seq((200L, 201L), (201L, 202L), (200L, 202L))
    val nodes = ((1L to 50L) ++ (100L to 103L) ++ (200L to 202L) ++
      Seq(300L, 301L)).toSeq
    def run(gate: Long) = Clustering.connectedComponents(
        edges.toDF("src", "dst"), "src", "dst",
        Some(nodes.toDF("src")), localFinishEdges = gate)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).toSeq
    val local = run(Long.MaxValue)
    val distributed = run(0L)
    assert(local === distributed)
    assert(local.toMap.apply(50L) === 1L)   // 49-hop chain reached
    assert(local.toMap.apply(300L) === 300L)
  }

  test("jaccardDedupClusters: transitive closure groups A~B~C together") {
    // b is within 0.7 Jaccard of both a and c, but a~c alone is below
    // the threshold — the transitive closure must still cluster all 3
    val base = (1 to 20).map(i => s"w$i")
    val a = base.mkString(" ")
    // a~b: 17/23 = 0.739; b~c: 17/23 = 0.739; a~c: 14/26 = 0.538 < 0.7
    val b = (base.drop(3) ++ Seq("x1", "x2", "x3")).mkString(" ")
    val c = (base.drop(6) ++ (1 to 6).map(i => s"x$i")).mkString(" ")
    val docs = Seq((1L, a, "en"), (2L, b, "en"), (3L, c, "en"),
      (9L, (1 to 20).map(i => s"z$i").mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")
    val got = Clustering.jaccardDedupClusters(docs, threshold = 0.7, lenBlock = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byId = got.map(t => t._1 -> t._2).toMap
    assert(byId(1L) === 1L && byId(2L) === 1L && byId(3L) === 1L)
    assert(byId(9L) === 9L)
    assert(got.collect { case (_, 1L, n) => n }.toSet === Set(3L))
  }

  test("jaccardDedupClusters: every doc appears exactly once") {
    val docs = Tables.documents(spark, sf0001).limit(100)
    val out = Clustering.jaccardDedupClusters(docs)
    assert(out.count() === 100)
    assert(out.select("doc_id").distinct().count() === 100)
  }

  test("jaccardDedupClusters: exact-duplicate collapse is semantics-free — " +
      "a 5x-duplicated corpus clusters identically with and without it") {
    import org.apache.spark.sql.functions.col
    // 5 copies of each doc under fresh ids: every copy must land in
    // its original's cluster (identical text = Jaccard 1.0), and the
    // component ids/sizes must match the uncollapsed run exactly
    val docs = Tables.documents(spark, sf0001).limit(40)
      .select(col("doc_id"), col("text"), col("lang"))
    val blown = (0 until 5).map(i =>
        docs.withColumn("doc_id", col("doc_id") + (i * 1000000L)))
      .reduce(_ unionByName _)
    def canon(collapse: Boolean) =
      Clustering.jaccardDedupClusters(blown, collapseExact = collapse)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    val on = canon(collapse = true)
    val off = canon(collapse = false)
    assert(on === off)
    // and the duplicates genuinely clustered: every copy of doc d has
    // d's component, so no component is smaller than the copy count
    assert(on.map(_._3).min >= 5L)
  }

  test("jaccardDedupClusters: CROSS-LANG identical texts do NOT collapse " +
      "across the lang block boundary (the round-18 inherited-state fix: " +
      "lang is a blocking key the text does not determine, so it must be " +
      "part of the collapse key)") {
    // doc 1 (en) and doc 5 (zh) share the exact text T; doc 6 (zh) is a
    // near-dup of T. The oracle semantics (pairs blocked on lang) give:
    //   en: {1} alone in its block's component;
    //   zh: {5, 6} paired (Jaccard 1.0 vs near-dup >= 0.7? use identical
    //       too, simplest: 6 shares text T as well).
    // The text-only collapse folded 5 and 6 into doc 1's representative,
    // crossing the lang boundary: component(5) became 1.
    val t = (1 to 20).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, t, "en"),
      (5L, t, "zh"),
      (6L, t, "zh")).toDF("doc_id", "text", "lang")
    val got = Clustering.jaccardDedupClusters(docs, threshold = 0.7,
        lenBlock = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byId = got.map(x => x._1 -> (x._2, x._3)).toMap
    assert(byId(1L) === (1L, 1L), "en doc must stay a singleton")
    assert(byId(5L) === (5L, 2L) && byId(6L) === (5L, 2L),
      "zh duplicates must cluster together under the zh-min id")
    // and the uncollapsed run agrees (the collapse stays semantics-free)
    val off = Clustering.jaccardDedupClusters(docs, threshold = 0.7,
        lenBlock = 10, collapseExact = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got.sortBy(_._1).toSeq === off)
  }
}
