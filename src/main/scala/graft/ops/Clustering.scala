package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph clustering for dedup pipelines: near-dup *pairs* (from
  * [[Dedup]] / [[Similarity]]) are only half the job — a usable corpus
  * dedup needs the transitive closure (A~B, B~C ⇒ {A,B,C} is ONE
  * cluster) so exactly one canonical document survives per group.
  *
  * `connectedComponents` is iterative min-label propagation over the
  * symmetric edge set: every node repeatedly adopts the smallest label
  * among itself and its neighbors until a fixpoint. Each iteration is
  * one equality-join shuffle plus one aggregation shuffle — the same
  * primitives Spark scales everywhere else — and the label frame is
  * `localCheckpoint`ed per iteration so the plan does not grow with
  * the iteration count (lineage-severed, O(1) plan depth).
  *
  * Scale: iterations needed = graph diameter. Near-dup clusters are
  * shallow (dozens of docs sharing one template ⇒ diameter ≤ 3-4), so
  * the loop converges in a handful of rounds even at billions of
  * nodes; each round's cost is two shuffles over the EDGE set, which
  * LSH banding already keeps near-linear in the corpus. For adversarial
  * long-path graphs the known fix is pointer-jumping (large-star /
  * small-star, O(log n) rounds); dedup graphs never need it, so the
  * simpler loop — fewer shuffles per round — wins here.
  *
  * Reference scope: the reference app (spark.py, app.py) has no graph
  * operator at all; this is part of the training-data-pipeline surface
  * built beyond it (SURVEY.md §8.3).
  */
object Clustering {

  /** Connected components of an undirected graph given as an edge list.
    *
    * @param edges   DataFrame with two long-typed columns
    * @param srcCol  source-id column name
    * @param dstCol  dest-id column name
    * @param nodes   optional universe of node ids (one long column,
    *                same name as `srcCol`); isolated nodes — no edges —
    *                appear as singleton components. Defaults to the
    *                ids present in `edges`.
    * @param maxIter hard cap on propagation rounds (diameter bound)
    * @return (node, component) — component = min node id reachable
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      nodes: Option[DataFrame] = None,
      maxIter: Int = 25): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    // symmetric closure: propagation must flow both directions
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)

    val universe = nodes
      .map(_.select(col(srcCol).cast("long").as("node")))
      .getOrElse(sym.select(col("src").as("node")))
      .distinct()

    var labels = universe.select(col("node"), col("node").as("comp"))
      .localCheckpoint(true)

    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      // each node's candidate label: min over neighbors' current labels
      val neighborMin = sym
        .join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(min(col("comp")).as("ncomp"))
      val next = labels
        .join(neighborMin, Seq("node"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"),
          (col("ncomp") < col("comp")).as("shrunk"))
        .localCheckpoint(true)
      // labels only ever decrease; fixpoint when nothing shrank
      changed = next.where(col("shrunk")).count()
      labels = next.drop("shrunk")
      iter += 1
    }
    labels.select(col("node"), col("comp").as("component"))
  }

  /** Near-dup document clusters: blocked word-set Jaccard pairs →
    * connected components → per-cluster size. Blocking is (lang,
    * n_tokens DIV `lenBlock`): near-identical docs have near-identical
    * token counts, so candidates stay within a block and pair
    * generation never goes quadratic in the corpus — it is quadratic
    * only within a block, the standard blocking trade-off (recall
    * bounded by the block width).
    *
    * Output: (doc_id, component, cluster_size); `component` is the min
    * doc_id of the cluster — the canonical survivor a dedup keeps.
    */
  def jaccardDedupClusters(
      docs: DataFrame,
      threshold: Double = 0.7,
      lenBlock: Int = 10): DataFrame = {
    val toks = docs.select(
      col("doc_id").cast("long").as("doc_id"),
      col("lang"),
      expr(s"size(split(text, ' ')) DIV $lenBlock").as("blk"),
      array_distinct(split(col("text"), " ")).as("ts"))
    val a = toks.select(col("doc_id").as("src"), col("lang"), col("blk"),
      col("ts").as("ts_a"))
    val b = toks.select(col("doc_id").as("dst"), col("lang"), col("blk"),
      col("ts").as("ts_b"))
    val pairs = a.join(b, Seq("lang", "blk"))
      .where(col("src") < col("dst"))
      .where(size(array_intersect(col("ts_a"), col("ts_b"))).cast("double") /
        size(array_union(col("ts_a"), col("ts_b"))) >= threshold)
      .select("src", "dst")

    val cc = connectedComponents(pairs, "src", "dst",
      nodes = Some(docs.select(col("doc_id").cast("long").as("src"))))
    cc.withColumnRenamed("node", "doc_id")
      .withColumn("cluster_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("component"))))
  }
}
