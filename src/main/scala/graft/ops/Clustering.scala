package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph clustering for dedup pipelines: near-dup *pairs* (from
  * [[Dedup]] / [[Similarity]]) are only half the job — a usable corpus
  * dedup needs the transitive closure (A~B, B~C ⇒ {A,B,C} is ONE
  * cluster) so exactly one canonical document survives per group.
  *
  * `connectedComponents` runs in two phases:
  *
  *  1. *Map-side contraction*: each partition runs a local union-find
  *     over its slice of the edge list and emits the path-compressed
  *     spanning forest (star edges node→root). A per-partition
  *     spanning forest preserves the component structure of that
  *     partition's edges, so the union over partitions preserves the
  *     whole graph's components — with FAR fewer edges (a clique's
  *     worth of edges collapses to one star). Passes repeat with
  *     alternating partition keys while the edge set keeps shrinking;
  *     each pass is one mapPartitions (no shuffle) plus one
  *     repartition. This is the genuine per-partition-imperative-logic
  *     case the engine reserves `mapPartitions` for.
  *  2. *Global min-label propagation with pointer jumping* on the
  *     contracted forest: each round every node adopts the smallest
  *     label in its closed neighborhood, then compresses one level of
  *     the label chain (label := label's label), reaching
  *     distance-2^i nodes by round ~i. The label frame is
  *     `localCheckpoint`ed per round so the plan stays O(1) deep, and
  *     labels monotonically decrease, so the fixpoint test is one
  *     scalar aggregate (exact decimal label sum) — no extra join.
  *
  * At 100 TB the contraction phase does the heavy lifting at scan
  * parallelism (dup clusters are dense — near-cliques — exactly the
  * shape local union-find collapses best), leaving the shuffle-bound
  * propagation loop a graph orders of magnitude smaller than the
  * input pair list.
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
    * @param localFinishEdges when the CONTRACTED forest has at most
    *   this many edges, finish it with one union-find on the driver
    *   instead of the distributed propagation loop: the collect is
    *   bounded by the gate itself (16 bytes/edge — the 4M default is
    *   ~64 MB), labels broadcast-join back to the universe, and the
    *   result is identical (union-by-min-root = min-reachable label).
    *   Map-side contraction typically collapses dup-cluster graphs
    *   (dense near-cliques) by orders of magnitude, so even 100 TB
    *   corpora often land under the gate; pass 0 to force the fully
    *   distributed path.
    * @return (node, component) — component = min node id reachable
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      nodes: Option[DataFrame] = None,
      maxIter: Int = 25,
      localFinishEdges: Long = 1L << 22): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // materialize the (possibly expensive) edge derivation ONCE —
    // everything below re-reads it
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
      .where(col(srcCol).cast("long") =!= col(dstCol).cast("long"))
      .localCheckpoint(true)

    val universe = nodes
      .map(_.select(col(srcCol).cast("long").as("node")))
      .getOrElse(e0.select(col("src").as("node"))
        .union(e0.select(col("dst").as("node"))))
      .distinct()

    // phase 1: map-side union-find contraction, alternating partition
    // keys so overlapping stars from one pass co-locate in the next
    def localForest(df: DataFrame): DataFrame =
      df.select("src", "dst").as[(Long, Long)].mapPartitions { it =>
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x
          while (parent.getOrElse(c, c) != r) {
            val n = parent(c); parent(c) = r; c = n
          }
          r
        }
        it.foreach { case (s, d) =>
          val rs = find(s); val rd = find(d)
          if (rs < rd) parent(rd) = rs
          else if (rd < rs) parent(rs) = rd
        }
        // snapshot keys first: find() path-compresses (mutates) the map
        parent.keys.toArray.iterator
          .map(n => (n, find(n)))
          .filter { case (n, r) => n != r }
      }.toDF("src", "dst")

    val nNodes = universe.count()
    var es = e0
    var m = es.count()
    var pass = 0
    var shrinking = m > 0
    while (shrinking && pass < 4) {
      // co-locate each node's edges (passes alternate the key so
      // overlapping stars from one pass co-locate in the next) — a
      // narrow two-column shuffle that typically lets ONE pass
      // collapse everything a partition can see
      val in = es.repartition(if (pass % 2 == 0) col("src") else col("dst"))
      val contracted = localForest(in).localCheckpoint(true)
      val m2 = contracted.count()
      // stop when a pass stops shrinking meaningfully, or the forest
      // is already below one-edge-per-node — more contraction can't
      // beat letting the (now tiny) propagation loop finish
      shrinking = m2 < m * 9 / 10 && m2 > nNodes
      es = contracted
      m = m2
      pass += 1
      if (sys.env.contains("SPARK_GRAFT_CC_DEBUG"))
        println(s"[cc] contraction pass $pass edges=$m2")
    }

    // small-remainder finish: the contracted forest is usually orders
    // of magnitude smaller than the input pair list (dup clusters are
    // near-cliques — exactly what local union-find collapses best).
    // When it fits under the gate, ~10 propagation-loop jobs (symmetric
    // closure, label init, per-round joins and fixpoint aggregates)
    // collapse into one bounded collect + one broadcast join. The gate
    // makes the driver memory bound explicit; union-by-min-root yields
    // the same min-reachable labels the propagation loop converges to.
    if (m <= localFinishEdges) {
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != r) {
          val n = parent(c); parent(c) = r; c = n
        }
        r
      }
      es.select("src", "dst").as[(Long, Long)].collect().foreach {
        case (s, d) =>
          val rs = find(s); val rd = find(d)
          if (rs < rd) parent(rd) = rs
          else if (rd < rs) parent(rs) = rd
      }
      val labelPairs = parent.keys.toArray.map(n => (n, find(n)))
        .filter { case (n, r) => n != r }
      val labelDf = labelPairs.toSeq.toDF("node", "__c")
      return universe.join(broadcast(labelDf), Seq("node"), "left")
        .select(col("node"), coalesce(col("__c"), col("node")).as("component"))
    }

    // phase 2: propagation needs the symmetric closure, pre-partitioned
    // on the join key (localCheckpoint preserves the hash partitioning,
    // so the per-round join never re-shuffles the edge side)
    val sym = es.union(es.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .repartition(col("src"))
      .localCheckpoint(true)

    var labels = universe.select(col("node"), col("node").as("comp"))
      .localCheckpoint(true)
    // labels monotonically decrease, so the exact label sum strictly
    // decreases until the fixpoint — a scalar fixpoint test, no join
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("comp")).cast("decimal(38,0)")).head.getDecimal(0)
    var prevSum = labelSum(labels)

    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // min label over the open neighborhood, then fold in the node's
      // own label (left join keeps edge-less singletons)
      val neighborMin = sym
        .join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(min(col("comp")).as("ncomp"))
      val next = labels
        .join(neighborMin, Seq("node"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
      // pointer jump through the PREVIOUS label map (checkpointed, so
      // no recompute): comp := labels(comp). Labels are always node
      // ids and old labels only exceed new ones, so the jump is total,
      // monotone, and compresses label chains — distance-2^i nodes
      // are reached by round ~i instead of round 2^i.
      val jumped = next
        .join(labels.select(col("node").as("jn"), col("comp").as("jc")),
          col("comp") === col("jn"))
        .select(col("node"), col("jc").as("comp"))
        .localCheckpoint(true)
      val s = labelSum(jumped)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = jumped
      iter += 1
      if (sys.env.contains("SPARK_GRAFT_CC_DEBUG"))
        println(s"[cc] round $iter labelSum=$s converged=$converged " +
          s"t=${System.nanoTime() / 1e9}")
    }
    labels.select(col("node"), col("comp").as("component"))
  }

  /** Near-dup document clusters: blocked word-set Jaccard pairs →
    * connected components → per-cluster size. Blocking is (lang,
    * n_tokens DIV `lenBlock`): near-identical docs have near-identical
    * token counts, so candidates stay within a block and pair
    * generation never goes quadratic in the corpus — it is quadratic
    * only within a block, the standard blocking trade-off (recall
    * bounded by the block width). EXACT duplicates never even reach
    * the pair stage: same-lang identical texts collapse to one min-id
    * representative first (one aggregation keyed on lang+md5(text) —
    * lang is a blocking key the text does not determine, so it must
    * be part of the collapse key), so within-block cost is quadratic
    * in distinct texts, not in duplication density — a 10×-duplicated
    * corpus pays the same comparison bill as its deduplicated twin.
    *
    * Two interchangeable pair generators (identical edge sets):
    *
    *  - default (`invertedIndex = false`): blocked pairwise join over
    *    xxhash64'd distinct-token arrays — one `array_intersect` on
    *    long arrays per candidate pair. Long-array intersection skips
    *    per-comparison string hashing, 3× faster when blocks are
    *    dense (shared-vocabulary corpora, where nearly every
    *    same-block pair is a candidate anyway).
    *  - `invertedIndex = true`: explode distinct tokens and
    *    equality-join on (block, token), counting matches per pair —
    *    no per-pair array ops at all. The right shape when tokens are
    *    SELECTIVE (realistic vocabularies): join output ∝ actually-
    *    overlapping pairs, not block², so it stays near-linear at
    *    100 TB where dense-block pairwise would blow up.
    *
    * |A∪B| = |A|+|B|−|A∩B| from exact integers either way, so the
    * Jaccard test is bit-identical to the string-set formulation an
    * oracle computes (hashed variant: modulo 64-bit xxhash collisions
    * within one pair's vocabulary — probability ~n²·2⁻⁶⁴).
    *
    * Output: (doc_id, component, cluster_size); `component` is the min
    * doc_id of the cluster — the canonical survivor a dedup keeps.
    */
  /** @param collapseExact when true (default), identical texts are
    *   collapsed to one min-id representative BEFORE pair generation
    *   (see the fingerprint note below) — candidate cost then depends
    *   on distinct texts, not duplication density. Set false ONLY when
    *   the input is already exact-deduplicated (e.g. downstream of
    *   [[Dedup.dedupAgainstSidecar]] or [[Dedup.exactDedup]]), where
    *   the collapse is provably a no-op and its two narrow shuffle
    *   stages are pure overhead. Output is identical either way. */
  def jaccardDedupClusters(
      docs: DataFrame,
      threshold: Double = 0.7,
      lenBlock: Int = 10,
      invertedIndex: Boolean = false,
      collapseExact: Boolean = true): DataFrame = {
    val base0 = docs.select(
      col("doc_id").cast("long").as("doc_id"),
      col("lang"),
      expr(s"size(split(text, ' ')) DIV $lenBlock").as("blk"),
      array_distinct(split(col("text"), " ")).as("ts"),
      // exact-duplicate collapse key, (lang, text) — NOT text alone:
      // two same-lang identical texts ALWAYS satisfy Jaccard 1.0 >=
      // threshold and share blk (blk is a function of the text), so
      // pair generation only ever needs ONE representative per
      // distinct (lang, text) — without this, a corpus with
      // duplication density d pays d^2 on every within-block
      // comparison (the 10x-duplicated ScaleBench corpus showed
      // cluster pair listing growing fastest of all benched queries
      // for exactly this reason). lang MUST be part of the key
      // because it is a blocking key the text does not determine
      // (round-18 inherited-state fix): a text-only collapse folded a
      // doc into a DIFFERENT-lang representative, silently crossing a
      // block boundary the pair stage never crosses — the collapsed
      // doc adopted a foreign-lang component and its own same-lang
      // near-dup pairs were never generated (latent at the gate SFs,
      // wrong answers at sf0.1 where cross-lang duplicate texts
      // exist; q103/q108/q129/q148 vs their oracles). Null-text and
      // null-lang rows keep a per-row key so they stay singletons,
      // matching the null-join semantics of the pair stage.
      when(col("text").isNotNull && col("lang").isNotNull,
          concat_ws("", col("lang"), md5(col("text"))))
        .otherwise(concat(lit("null-"), col("doc_id").cast("string")))
        .as("__fp"))
    // min-id representative per distinct text, via ONE min_by
    // aggregation on the fingerprint: it partial-aggregates map-side,
    // so the shuffle moves at most one array row per DISTINCT text per
    // partition — at duplication density d that is d× LESS array
    // traffic than the pair join itself, not more. Members rejoin
    // their representative's component through the fingerprint at the
    // end (narrow rows only).
    val reps =
      if (collapseExact)
        base0.groupBy(col("__fp"))
          .agg(min_by(struct(col("doc_id"), col("lang"), col("blk"), col("ts")),
            col("doc_id")).as("__r"))
          .select(col("__fp"), col("__r.doc_id").as("doc_id"),
            col("__r.lang").as("lang"), col("__r.blk").as("blk"),
            col("__r.ts").as("ts"))
      else base0
    val base = reps.drop("__fp")
    val pairs =
      if (invertedIndex) {
        val toks = base.withColumn("n_distinct", size(col("ts")))
        val tok = toks.select(col("doc_id"), col("lang"), col("blk"),
          col("n_distinct"), explode(col("ts")).as("token"))
        val a = tok.select(col("doc_id").as("src"), col("lang"), col("blk"),
          col("n_distinct").as("na"), col("token"))
        val b = tok.select(col("doc_id").as("dst"), col("lang"), col("blk"),
          col("n_distinct").as("nb"), col("token"))
        a.join(b, Seq("lang", "blk", "token"))
          .where(col("src") < col("dst"))
          .groupBy(col("src"), col("dst"), col("na"), col("nb"))
          .agg(count(lit(1)).as("shared"))
          .where(col("shared").cast("double") /
            (col("na") + col("nb") - col("shared")) >= threshold)
          .select("src", "dst")
      } else {
        // arrays sorted ONCE per document; each candidate pair is then
        // one zero-allocation sorted-merge scan inside whole-stage
        // codegen (graft.functions.SortedIntersectCount)
        val htoks = base.select(col("doc_id"), col("lang"), col("blk"),
          array_sort(transform(col("ts"), t => xxhash64(t))).as("hs"))
        val a = htoks.select(col("doc_id").as("src"), col("lang"), col("blk"),
          col("hs").as("hs_a"))
        val b = htoks.select(col("doc_id").as("dst"), col("lang"), col("blk"),
          col("hs").as("hs_b"))
        a.join(b, Seq("lang", "blk"))
          .where(col("src") < col("dst"))
          .withColumn("shared", graft.functions.GraftFunctions
            .sorted_intersect_count(col("hs_a"), col("hs_b")))
          .where(col("shared").cast("double") /
            (size(col("hs_a")) + size(col("hs_b")) - col("shared")) >= threshold)
          .select("src", "dst")
      }

    // components over REPRESENTATIVES only; members then adopt their
    // representative's component. The component id is unchanged by the
    // collapse: the cluster's global min doc_id is itself a
    // representative (it is the min of its own text group), so the
    // min-reachable-label CC over reps yields the same ids the
    // all-docs CC did. cluster_size counts ALL member docs.
    val cc = connectedComponents(pairs, "src", "dst",
      nodes = Some(base.select(col("doc_id").as("src"))))
    val labeled =
      if (collapseExact) {
        val fpComp = reps.select(col("doc_id"), col("__fp"))
          .join(cc.withColumnRenamed("node", "doc_id"), "doc_id")
          .select(col("__fp"), col("component"))
        base0.select(col("doc_id"), col("__fp"))
          .join(fpComp, "__fp")
          .select(col("doc_id"), col("component"))
      } else cc.withColumnRenamed("node", "doc_id")
    labeled
      .withColumn("cluster_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("component"))))
  }
}
