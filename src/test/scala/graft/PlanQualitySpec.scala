package graft

import graft.queries.{AdvancedQueries, CoreQueries}
import org.apache.spark.sql.DataFrame

/** Plan-shape regressions are silent perf bugs at 100 TB: a filter
  * that stops reaching the scan or a dimension join that stops
  * broadcasting still returns correct rows. These tests pin the plan
  * properties the scale story depends on. */
class PlanQualitySpec extends SparkSpec {

  private def executed(df: DataFrame): String = {
    df.collect() // finalize adaptive plan
    df.queryExecution.executedPlan.toString
  }

  /** Run `body` under a SparkListener counting jobs and
    * shuffle-writing stages (each is a full-data shuffle at 100 TB;
    * skipped/reused stages never complete, so plan reuse counts as
    * zero). AtomicInteger, not `@volatile var +=`: listener callbacks
    * can fire concurrently and a volatile read-modify-write is a
    * lost-update race that could let a blown budget pass undetected
    * (round-13 ADVICE). Waits for the async listener bus to settle
    * before returning (no public listenerBus.waitUntilEmpty). */
  private def withShuffleCount[T](body: => T): (T, Int, Int) = {
    val shuffleWritingStages = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        if (s.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten > 0)
          shuffleWritingStages.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val out =
      try {
        val r = body
        var prev = -1
        while (prev != shuffleWritingStages.get() + jobs.get()) {
          prev = shuffleWritingStages.get() + jobs.get()
          Thread.sleep(300)
        }
        r
      } finally spark.sparkContext.removeSparkListener(listener)
    (out, shuffleWritingStages.get(), jobs.get())
  }

  test("q02: filters and column pruning reach the parquet scan") {
    val plan = executed(CoreQueries.q02FilterProject.fn(spark, sf0001))
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity)") ||
      plan.contains("GreaterThan(l_quantity,45.0)"), plan.take(400))
    assert(plan.contains("ReadSchema"))
    // pruned: the 11-column lineitem scan must NOT read l_returnflag
    assert(!plan.split("ReadSchema")(1).takeWhile(_ != '\n').contains("l_returnflag"))
  }

  test("q03: dimension joins broadcast (no shuffle join for nation/region)") {
    val plan = executed(CoreQueries.q03JoinAgg.fn(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"), plan.take(400))
    assert(!plan.contains("CartesianProduct"))
  }

  test("q56: the range join is a hash join on bins, not a nested loop") {
    val plan = executed(AdvancedQueries.q56RangeJoin.fn(spark, sf0001))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
    assert(!plan.contains("CartesianProduct"))
  }

  test("the as-of join operator pays exactly one shuffle on the key") {
    import org.apache.spark.sql.functions.col
    // the raw operator, without the oracle-facing global ORDER BY the
    // q42 query adds (that sort is its own, separate exchange)
    val ev = graft.sources.Tables.events(spark, sf0001)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("p_event"), col("value").as("p_value"))
    val df = graft.ops.AsOf.asOfJoin(errors, purchases, Seq("user_id"),
      "ts", "ts", Seq("p_event", "p_value"), tiebreak = Some("p_event"))
    df.collect()
    // AdaptiveSparkPlan.toString prints BOTH the final and the initial
    // plan; count exchanges in the final section only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // each materialized AQE stage prints as ShuffleQueryStage wrapping
    // its Exchange — counting "Exchange " alone counts each shuffle once
    val exchanges = "Exchange ".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 key shuffle, got $exchanges:\n${plan.take(800)}")
  }

  test("EXISTS/NOT EXISTS decorrelate to semi/anti joins (no per-row subqueries)") {
    val plan = executed(
      graft.queries.PipelineQueries.q110ExistsSubquery.fn(spark, sf0001))
    assert(plan.contains("LeftSemi"), plan.take(600))
    assert(plan.contains("LeftAnti"), plan.take(600))
  }

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    // partitioned fact: 3 region partitions; selective dim filter on a
    // non-partition attribute must reach the fact scan as a runtime
    // (dynamicpruning) subquery, not as a full 3-partition scan
    graft.sources.Tables.orders(spark, sf0001)
      .withColumn("part_key", pmod(col("o_custkey"), lit(3)))
      .write.mode("overwrite").partitionBy("part_key").parquet(dir)
    val fact = spark.read.parquet(dir)
    // partition-column types must match EXACTLY (a cast on the
    // partition key disqualifies dynamic pruning — the directory
    // column is discovered as int), and the dim must be a FILE
    // relation: a local Seq gets constant-folded by
    // ConvertToLocalRelation, which erases the selective Filter the
    // pruning rule looks for
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dpp-dim").toString
    Seq((0, "keep"), (1, "drop"), (2, "drop")).toDF("part_key", "label")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val q = fact.join(dim, Seq("part_key")).where(col("label") === "keep")
      .agg(count(lit(1)))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
      s"no dynamic partition pruning in:\n${plan.take(1200)}")
  }

  test("runtime bloom filter prunes the fact side of a selective fact-fact join") {
    import org.apache.spark.sql.functions._
    // thresholds lowered so the optimizer considers the tiny test
    // inputs; the assertion is about PLAN SHAPE (the injected
    // bloom_filter semi-join filter), which is config-independent
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // runtime filters only piggyback on SHUFFLE joins — at test
      // scale both sides would broadcast, which never needs one
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = graft.sources.Tables.lineitem(spark, sf0001)
        .select(col("l_orderkey"), col("l_quantity"))
      val ord = graft.sources.Tables.orders(spark, sf0001)
        .where(col("o_totalprice") > 400000)   // selective build side
        .select(col("o_orderkey"))
      val q = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .agg(sum(col("l_quantity")))
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter"),
        s"no runtime bloom filter in:\n${plan.take(1200)}")
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("batch k-NN join (LSH): candidates come from a bucket EQUALITY join, " +
      "never a cross join") {
    import org.apache.spark.sql.functions.{col, expr}
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    // bits=4 so buckets are populated at this tiny SF (the production
    // default of 12 leaves every test vector in its own bucket)
    val q = graft.ops.Similarity.annJoinLsh(
      queries = emb.filter(expr("vec_id % 100 = 0")), corpus = emb,
      idCol = "vec_id", vecCol = "embedding", k = 5, bits = 4)
    val plan = executed(q)
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin") ||
      plan.contains("ShuffledHashJoin"), plan.take(800))
    // and the self-match exclusion must not have been pulled out of the
    // equality join into a post-join nested loop
    assert(q.count() > 0)
  }

  test("semantic dedup (q134): pair generation is bucket-bounded — no " +
      "cartesian product or nested loop anywhere in the pair plan") {
    import org.apache.spark.sql.functions.expr
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    // the pair stage is the scale-critical plan (components run as a
    // checkpointed loop downstream); assert its joins are all equality
    val pairs = graft.ops.Similarity.embeddingDedupPairs(
      emb, "vec_id", "embedding", threshold = 0.9, bits = 4)
    val plan = executed(pairs)
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    // end-to-end: the composed operator runs and labels every row
    val n = emb.count()
    assert(graft.ops.Similarity.semanticDedupClusters(
      emb, "vec_id", "embedding", threshold = 0.9, bits = 4).count() === n)
  }

  test("near-dup sidecar membership (q136): every executed plan in the " +
      "operator uses equality joins only — no cartesian, no nested loop") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-mhplan").toString
    val docs = graft.sources.Tables.documents(spark, sf0001)
    graft.ops.Dedup.writeMinhashSidecar(
      docs.filter(col("doc_id") % 2 === 0), "text", "doc_id", s"$dir/mh")
    // the operator checkpoints internally (truncating the returned
    // plan), so capture EVERY plan it executes via a listener instead
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          ns: Long): Unit = { plans.add(qe.executedPlan.toString); () }
      override def onFailure(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val survivors = graft.ops.Dedup.nearDupAgainstSidecar(
        docs.filter(col("doc_id") % 2 === 1), "text", "doc_id", s"$dir/mh",
        appendSurvivors = false)
      assert(survivors.count() > 0)
      assert(survivors.columns.toSeq === docs.columns.toSeq)
      // listener delivery is async; poll briefly for the plans to land
      val deadline = System.nanoTime() + 10_000_000_000L
      while (plans.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      val all = plans.toArray(Array.empty[String])
      assert(all.nonEmpty)
      all.foreach { p =>
        assert(!p.contains("CartesianProduct"), p.take(600))
        assert(!p.contains("BroadcastNestedLoopJoin"), p.take(600))
      }
    } finally spark.listenerManager.unregister(listener)
  }

  test("composed curation pipeline (q131): bounded shuffle budget, no " +
      "cartesian products, the only unpartitioned window is the bounded " +
      "per-source budget share") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-q131").toString
    val docs = graft.sources.Tables.documents(spark, sf0001)
    graft.ops.Dedup.writeFingerprintSidecar(
      docs.filter(col("doc_id") % 2 === 0), "text", dir)
    // the pipeline materializes in several jobs (checkpointed operator
    // boundaries), so the shuffle budget must be counted across ALL of
    // them, not just the final (checkpoint-truncated) plan. Under AQE
    // every materialized query stage runs as its own job, so
    // stage-minus-job arithmetic is useless — count the stages that
    // actually WROTE shuffle data (each one is a full shuffle of its
    // output at 100 TB). Skipped / reused stages never complete, so
    // plan reuse correctly counts as zero.
    val (df, shuffleWritingStages, jobs) = withShuffleCount {
      val out = graft.queries.ScaleQueries.curationPipeline(docs, dir)
      out.collect()
      out
    }
    val nodes = flattenPlan(df.queryExecution.executedPlan)
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec]))
    // every distributed ranking rides a partitioned window; the single
    // allowed empty partitionSpec is the budget share computed over the
    // per-SOURCE aggregate (rows = source count, bounded by design)
    val unpartitioned = nodes.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.size <= 1,
      s"unpartitioned windows:\n${unpartitioned.mkString("\n")}")
    // shuffle budget across the whole pipeline: dedup anti-join +
    // survivor window, span occurrence count + join-back + doc rollup,
    // cluster pair-join + CC contraction/propagation rounds, quality
    // argmax joins, budget agg + admission window, the pack range
    // shuffle, and the small broadcast-prep aggs. A regression here
    // means a stage stopped reusing a partitioning or an operator
    // gained an extra pass — each extra shuffle-writing stage is a
    // full-data shuffle at 100 TB. Measured 20 at this SF (the gated
    // CC local finish replaced the propagation loop's per-round
    // shuffles; was 34 with the distributed loop); 28 leaves slack for
    // AQE re-planning and a forced-distributed CC without letting a
    // whole extra pipeline stage sneak in.
    assert(shuffleWritingStages <= 28,
      s"shuffle budget blown: $shuffleWritingStages shuffle-writing " +
        s"stages across $jobs jobs")
  }

  test("probe feature scaling (q210): no computed-expression DataFilter " +
      "reaches the documents scan (the 9x interpreted-filter regression)") {
    // LinearProbe.scaled enforces its NULL contract inside the
    // projection precisely so Catalyst cannot push inferred
    // isnotnull(<expression tree>) constraints into the parquet scan,
    // where they would re-run tokenization per row in interpreted
    // mode (measured 9x on this chain). Pin it: every FileScan's
    // DataFilters must stay free of the tokenization expressions.
    val scaled = graft.queries.CurationQueries.probeScaledLazy(spark, sf0001)
    val plan = scaled.queryExecution.executedPlan.toString
    // the benign pre-existing explode guard (size(split(text)) > 0,
    // one split per row) is allowed; the pathology is the DERIVED
    // trees — bigram construction (transform over sequence) and
    // stopword counting (tokens_in_set) evaluated interpreted at the
    // scan
    val scanFilters = plan.split("\n").filter(_.contains("DataFilters:"))
    scanFilters.foreach { l =>
      assert(!l.contains("transform(") && !l.contains("tokens_in_set("),
        s"derived-expression filter reached a scan: ${l.trim.take(200)}")
    }
  }

  test("composed quality-feature table (q209): one DAG, bounded shuffle " +
      "budget, no cartesians, every window partitioned") {
    val (df, shuffleWritingStages, jobs) = withShuffleCount {
      val out = graft.queries.CurationQueries.q209QualityFeatures
        .fn(spark, sf0001)
      out.collect()
      out
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
    // the only windows are the per-source percentile rank (partitioned
    // by source) — no global single-reducer window anywhere
    assertNoUnpartitionedWindow(df)
    // shuffle budget for the whole feature assembly: each signal's own
    // aggs (doc-word/doc rollups ×2 for repetition, rarity's word
    // repartition + tf + doc rollup, coherence's bigram/corpus/uni
    // rollups + two doc aggs, the LM's c12/starts/conts rollups + doc
    // agg, the source-partitioned percentile exchange) plus the final
    // doc-keyed feature joins. An extra shuffle-writing stage here is
    // a corpus-sized pass at 100 TB. Measured 26 at this SF; 32 leaves
    // AQE-replan slack without letting a whole signal re-derive.
    assert(shuffleWritingStages <= 32,
      s"shuffle budget blown: $shuffleWritingStages shuffle-writing " +
        s"stages across $jobs jobs")
    info(s"q209 shuffle-writing stages: $shuffleWritingStages over $jobs jobs")
  }

  test("probe quality cut (q215): bounded shuffle budget, no cartesians, " +
      "no unpartitioned window in the budget-cut rank") {
    val (df, shuffleWritingStages, jobs) = withShuffleCount {
      val out = graft.queries.CurationQueries.q215ProbeQualityCut
        .fn(spark, sf0001)
      out.collect()
      out
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
    // the only windows: the per-source percentile (partitioned by
    // source) inside the feature chain, and the per-__pid local
    // rank/cumsum of globalRankAndRunningSum — never a global
    // single-reducer ORDER BY window over the corpus
    assertNoUnpartitionedWindow(df)
    // budget: the q210 feature+Gram chain (its signals' own aggs +
    // doc-keyed feature joins — mostly broadcast at this SF), the
    // n_tokens join, the budget cut's ONE range exchange + offsets
    // pass. Measured 8 at this SF (AQE broadcasts the doc-keyed
    // joins); 24 admits the sort-merge shapes those joins take at
    // cluster scale without letting an extra corpus-sized pass in.
    assert(shuffleWritingStages <= 24,
      s"shuffle budget blown: $shuffleWritingStages shuffle-writing " +
        s"stages across $jobs jobs")
    info(s"q215 shuffle-writing stages: $shuffleWritingStages over $jobs jobs")
  }

  test("full pre-training pipeline (q218): bounded shuffle budget, no " +
      "cartesians, the only unpartitioned window is the per-source " +
      "budget share") {
    val (df, shuffleWritingStages, jobs) = withShuffleCount {
      val out = graft.queries.CurationQueries.q218CurationPipeline
        .fn(spark, sf0001)
      out.collect()
      out
    }
    val nodes = flattenPlan(df.queryExecution.executedPlan)
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec]))
    // every corpus-sized ranking is partitioned (span-removal keep
    // window by chunk md5, calibration window by source, admission
    // window by source, pack's per-__pid local window); the single
    // allowed empty partitionSpec is the budget share over the
    // per-SOURCE aggregate (rows = source count, bounded by design —
    // the q126/q131 precedent)
    val unpartitioned = nodes.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.size <= 1,
      s"unpartitioned windows:\n${unpartitioned.mkString("\n")}")
    // shuffle budget across all six stages: dedup agg + survivor join,
    // span-removal chunk window + doc rollup, decontam gram agg, the
    // probe feature chain's aggs (checkpoint-materialized once), the
    // calibration and admission source windows, budget agg, the pack
    // range exchange + offsets pass, and the oracle-facing final sort.
    // An extra shuffle-writing stage here is a corpus-sized pass at
    // 100 TB. Measured 23 at this SF (AQE broadcasts the doc-keyed
    // joins); 36 admits the sort-merge shapes those joins take at
    // cluster scale without letting a whole extra stage sneak in.
    assert(shuffleWritingStages <= 36,
      s"shuffle budget blown: $shuffleWritingStages shuffle-writing " +
        s"stages across $jobs jobs")
    info(s"q218 shuffle-writing stages: $shuffleWritingStages over $jobs jobs")
  }

  test("cdcChunk and groupAwareSplit are pure projections: zero exchanges " +
      "in the executed plan") {
    import org.apache.spark.sql.functions.{col, md5}
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val p1 = executed(
      graft.ops.TextAnalysis.cdcChunk(docs, "text", 5, "doc_id"))
    assert(!p1.contains("Exchange"), p1.take(600))
    val p2 = executed(
      graft.ops.Relational.groupAwareSplit(docs, md5(col("text")), 0.3))
    assert(!p2.contains("Exchange"), p2.take(600))
  }

  test("diversitySample: bucket-partitioned window + TakeOrdered, no global " +
      "sort") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val q = graft.ops.Similarity.diversitySample(emb, "vec_id", "embedding",
      k = 100, bits = 4, dim = 64)
    q.collect()
    val flat = flattenPlan(q.queryExecution.executedPlan)
    assert(flat.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.TakeOrderedAndProjectExec]),
      "limit did not plan as TakeOrderedAndProject")
    assertNoUnpartitionedWindow(q)
  }

  test("batch k-NN join (brute force): the only nested loop is the bounded " +
      "query-batch broadcast; ranking is group-limited before the shuffle") {
    import org.apache.spark.sql.functions.expr
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val q = graft.ops.Similarity.annJoinBruteForce(
      queries = emb.filter(expr("vec_id % 100 = 0")), corpus = emb,
      idCol = "vec_id", vecCol = "embedding", k = 5)
    val plan = executed(q)
    // the query batch side must be the broadcast build side
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    // WindowGroupLimit caps per-query candidates at k map-side — the
    // shuffle moves |queries|·k·partitions rows, not |corpus|·|queries|
    assert(plan.contains("WindowGroupLimit"), plan.take(1200))
  }

  test("BM25 top-k (q177): query terms and corpus totals broadcast; the " +
      "postings join is a broadcast hash join, never a corpus shuffle on " +
      "query keys") {
    val plan = executed(
      graft.queries.RetrievalQueries.q177Bm25TopK.fn(spark, sf0001))
    // scoring joins the (small, broadcast) query-term and totals sides
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    // the only nested loop is the bounded 1-row totals cross join (the
    // q160 pattern); a real cartesian would be a quadratic candidate bug
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    // per-query ranking is group-limited map-side before the shuffle
    assert(plan.contains("WindowGroupLimit"), plan.take(1200))
  }

  test("TF-IDF keywords (q199): the per-doc rank <= k rides WindowGroupLimit; " +
      "the only nested loop is the 1-row n_docs broadcast") {
    val plan = executed(
      graft.queries.CorpusQueries.q199TfidfKeywords.fn(spark, sf0001))
    assert(plan.contains("WindowGroupLimit"), plan.take(1200))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("containment join (q203): candidates come from a token EQUALITY " +
      "join — no cartesian anywhere in the pair generation") {
    val plan = executed(
      graft.queries.DataQueries.q203ContainmentPairs.fn(spark, sf0001))
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1200))
  }

  test("personalized PageRank (q197): every join is keyed (hash/sort-merge " +
      "or broadcast) — no cartesian in the 5-iteration chain") {
    val plan = executed(
      graft.queries.GraphQueries.q197PersonalizedPagerank.fn(spark, sf0001))
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1200))
  }

  test("triangle counting (q205): wedge generation and closure are keyed " +
      "equi-joins — no cartesian anywhere") {
    val plan = executed(
      graft.queries.GraphQueries.q205TriangleCounts.fn(spark, sf0001))
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1200))
  }

  test("skip-gram PMI (q207): position pairing is an equality join; the " +
      "per-word rank <= k rides WindowGroupLimit; the only nested loop is " +
      "the 1-row total broadcast") {
    val plan = executed(
      graft.queries.CorpusQueries.q207SkipgramPmi.fn(spark, sf0001))
    assert(plan.contains("WindowGroupLimit"), plan.take(1200))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }
}
