package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("wordNgrams builds sliding windows; short docs yield empty") {
    val got = Seq("a b c d", "a b", "a").toDF("text")
      .select(TextAnalysis.tokens($"text").as("ts"))
      .select(TextAnalysis.wordNgrams($"ts", 3).as("g"))
      .as[Seq[String]].collect().toSeq
    assert(got(0) === Seq("a b c", "b c d"))
    assert(got(1) === Seq.empty)
    assert(got(2) === Seq.empty)
  }

  test("decontaminate flags the doc sharing grams with the eval set") {
    // eval doc holds "x y z"; train doc 1 contains it verbatim, doc 2
    // shares nothing, doc 3 is too short to carry a 3-gram
    val train = Seq(
      (1L, "p q x y z r"), // grams: p q x, q x y, x y z, y z r → 1 of 4 hit
      (2L, "a b c d"),
      (3L, "x y")).toDF("doc_id", "text")
    val eval_ = Seq((100L, "w x y z")).toDF("doc_id", "text")
    val got = Curation.decontaminate(train, eval_, n = 3, threshold = 0.25)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_grams", $"n_hit", $"contaminated")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got === Seq((1L, 4L, 1L, true), (2L, 2L, 0L, false)))
  }

  test("decontaminate counts DISTINCT grams once per doc") {
    val train = Seq((1L, "x y z x y z x y z")).toDF("doc_id", "text")
    val eval_ = Seq((9L, "x y z")).toDF("doc_id", "text")
    val row = Curation.decontaminate(train, eval_, n = 3)
      .select($"n_grams", $"n_hit").as[(Long, Long)].collect()(0)
    // distinct grams of the repeated doc: x y z / y z x / z x y → 3,
    // only "x y z" appears in eval
    assert(row === ((3L, 1L)))
  }

  test("repetitionSignals: fractions on a hand-checked doc") {
    val docs = Seq((1L, "a a a b"), (2L, "a b c d")).toDF("doc_id", "text")
    val got = Curation.repetitionSignals(docs).orderBy($"doc_id")
      .select($"n_toks", $"n_distinct", $"dup_word_frac", $"top_word_share",
        $"dup_bigram_frac")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    // doc1: 4 toks, 2 distinct; top word "a" ×3; bigrams a a, a a, a b
    //       → nb=3, nbd=2 → dup_bigram 1/3
    assert(got(0) === ((4L, 2L, 0.5, 0.75, 1.0 / 3)))
    // doc2: no repetition anywhere
    assert(got(1) === ((4L, 4L, 0.0, 0.25, 0.0)))
  }

  test("repetitionSignals: fused one-scan stats equal the exploded " +
      "formulation (round-19 rewrite), incl. empty/duplicate-space edges") {
    // the reference semantics: explode(split(text,' ',-1)) word counts +
    // in-row bigram arrays — exactly the pre-round-19 operator body
    def reference(docs: org.apache.spark.sql.DataFrame) = {
      import org.apache.spark.sql.functions._
      val withBigrams = docs
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ts"))
        .select(col("doc_id"), col("ts"),
          size(TextAnalysis.wordNgrams(col("ts"), 2)).cast("long").as("nb"),
          size(array_distinct(TextAnalysis.wordNgrams(col("ts"), 2)))
            .cast("long").as("nbd"))
      withBigrams
        .select(col("doc_id"), col("nb"), col("nbd"),
          explode(col("ts")).as("w"))
        .groupBy(col("doc_id"), col("nb"), col("nbd"), col("w"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"), col("nb"), col("nbd"))
        .agg(sum(col("c")).as("n_toks"), count(lit(1)).as("n_distinct"),
          max(col("c")).as("top_cnt"))
        .select(col("doc_id"), col("n_toks"), col("n_distinct"),
          ((col("n_toks") - col("n_distinct")).cast("double") /
            col("n_toks")).as("dup_word_frac"),
          (col("top_cnt").cast("double") / col("n_toks"))
            .as("top_word_share"),
          when(col("nb") === 0L, lit(0.0))
            .otherwise((col("nb") - col("nbd")).cast("double") / col("nb"))
            .as("dup_bigram_frac"))
    }
    // edge cases the byte-scan must match split(' ', -1) on: empty
    // text (one empty token), leading/trailing/double spaces (empty
    // tokens kept), single token, all-identical tokens, repeated
    // bigrams through empty tokens, multi-byte UTF-8 tokens
    val edge = Seq(
      (1L, ""), (2L, " "), (3L, "a"), (4L, "a a a a"),
      (5L, " a"), (6L, "a "), (7L, "a  b  a  b"), (8L, "µß 漢字 µß 漢字"),
      (9L, "x y x y x"), (10L, "a b a b a b c")).toDF("doc_id", "text")
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text")
    for (d <- Seq(edge, docs)) {
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.orderBy($"doc_id")
          .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
      assert(canon(Curation.repetitionSignals(d)) === canon(reference(d)))
    }
  }

  test("vocabCoverage: ranks by count desc then word, cumulative share") {
    val docs = Seq((1L, "b b b a a c")).toDF("doc_id", "text")
    val got = Curation.vocabCoverage(docs, coverage = 0.85)
      .orderBy($"rank")
      .select($"w", $"cnt", $"rank", $"cum_share", $"in_vocab")
      .as[(String, Long, Long, Double, Boolean)].collect().toSeq
    assert(got === Seq(
      ("b", 3L, 1L, 0.5, true),
      ("a", 2L, 2L, 5.0 / 6, true),
      ("c", 1L, 3L, 1.0, false)))
  }

  test("vocabCoverage (distributed) is byte-identical to the single-window " +
      "formulation on the real documents table") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"rank")
        .select($"w", $"cnt", $"rank", $"cum_share", $"in_vocab")
        .as[(String, Long, Long, Double, Boolean)].collect().toSeq
    val dist = canon(Curation.vocabCoverage(docs))
    val single = canon(Curation.vocabCoverageSingleWindow(docs))
    assert(dist.nonEmpty)
    assert(dist === single)
  }

  test("vocabCoverage default path has NO unpartitioned window (the ranking " +
      "is distributed over range partitions)") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val df = Curation.vocabCoverage(docs)
    df.collect()
    // AQE hides the final plan behind AdaptiveSparkPlanExec/QueryStage
    // nodes; a plain TreeNode.collect would stop at the wrapper
    def flatten(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val next = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(s.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          Seq(r.child)
        case other => other.children
      }
      p +: next.flatMap(flatten)
    }
    val windows = flatten(df.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, "expected the per-partition ranking window")
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"unpartitioned window in the scale path:\n$w")
    }
    // and the vocabulary really is spread over multiple range partitions
    // (the whole point — one reducer must not rank billions of words)
    val parts = Curation.vocabCoverage(docs)
      .select(spark_partition_id()).distinct().count()
    assert(parts >= 1)
  }

  test("piiRedact scrubs emails and phones and counts them") {
    val row = Seq("mail me at bob.1@x.com or 555-1234 or 555-9999 ok")
      .toDF("t")
      .select(Curation.piiRedact($"t").map { case (n, c) => c.as(n) }: _*)
      .collect()(0)
    assert(row.getAs[Long]("n_email") === 1L)
    assert(row.getAs[Long]("n_phone") === 2L)
    assert(row.getAs[String]("redacted") ===
      "mail me at [EMAIL] or [PHONE] or [PHONE] ok")
  }

  test("decontaminateHashed matches the exact path on the test corpus") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val train = docs.filter($"doc_id" % 19 =!= 0)
    val eval_ = docs.filter($"doc_id" % 19 === 0)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", $"n_grams", $"n_hit", $"contaminated")
        .orderBy($"doc_id")
        .as[(Long, Long, Long, Boolean)].collect().toSeq
    val exact = canon(Curation.decontaminate(train, eval_, n = 3))
    val hashed = canon(Curation.decontaminateHashed(train, eval_, n = 3))
    // identical gram counts, hit counts and flags: XXH64 has no
    // collisions on this corpus, and hashed_shingles' distinct-hash
    // semantics equal distinct-gram semantics
    assert(hashed === exact)
  }

  test("decontaminate plans the eval-gram side as a broadcast join") {
    // the 100 TB contract: the corpus side must never shuffle for the
    // join — only the benchmark-sized eval gram set moves
    val docs = Seq((1L, "a b c d e"), (2L, "c d e f g")).toDF("doc_id", "text")
    val plan = Curation.decontaminate(docs, docs.limit(1), n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast join for eval grams, got:\n$plan")
    assert(!plan.contains("SortMergeJoin"))
  }

  test("piiRedact leaves clean text untouched") {
    val row = Seq("no pii here at all").toDF("t")
      .select(Curation.piiRedact($"t").map { case (n, c) => c.as(n) }: _*)
      .collect()(0)
    assert(row.getAs[Long]("n_email") === 0L)
    assert(row.getAs[Long]("n_phone") === 0L)
    assert(row.getAs[String]("redacted") === "no pii here at all")
  }

  test("capPerSource keeps at most cap docs per source, small sources whole") {
    val docs = ((1L to 20L).map(i => (i, "big")) ++
      Seq((21L, "small"), (22L, "small"))).toDF("doc_id", "source")
    val kept = Curation.capPerSource(docs, "source", "doc_id", cap = 5)
      .select($"source", $"doc_id", $"src_rank")
      .as[(String, Long, Long)].collect().toSeq
    val bySource = kept.groupBy(_._1)
    assert(bySource("big").size === 5)
    assert(bySource("small").map(_._2).sorted === Seq(21L, 22L))
    // ranks are 1..n within every source
    bySource.foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted === (1L to rows.size).toSeq)
    }
  }

  test("capPerSource is deterministic in (id, seed) and seed-sensitive") {
    val docs = (1L to 50L).map(i => (i, s"s${i % 2}")).toDF("doc_id", "source")
    def keptIds(seed: Long) =
      Curation.capPerSource(docs, "source", "doc_id", cap = 10, seed = seed)
        .select($"doc_id").as[Long].collect().toSet
    assert(keptIds(42L) === keptIds(42L))       // pure function of (id, seed)
    assert(keptIds(42L) !== keptIds(43L))       // a new seed redraws the sample
    assert(keptIds(43L).size === 20)            // cap still honored per source
  }

  test("capPerSource plans a map-side window group limit (partial)") {
    // the 100 TB contract: a hot source's shuffle volume must be
    // cap × map-tasks, not its row count — InferWindowGroupLimit must
    // fire on the rank ≤ cap filter
    val docs = (1L to 100L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "source")
    val q = Curation.capPerSource(docs, "source", "doc_id", cap = 4)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(1200))
    assert(plan.contains("Partial"), plan.take(1200))
  }

  test("tokenRarity scores match a hand-checked corpus") {
    // corpus counts: a→2, b→2, c→1, z→1
    val docs = Seq((1L, "a b a"), (2L, "b c"), (3L, "z")).toDF("doc_id", "text")
    val got = Curation.tokenRarity(docs).orderBy($"doc_id")
      .select($"doc_id", $"n_toks", $"sum_cnt", $"min_cnt", $"mean_cnt")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 3L, 6L, 2L, 2.0),              // a+b+a = 2+2+2
      (2L, 2L, 3L, 1L, 1.5),              // b+c = 2+1
      (3L, 1L, 1L, 1L, 1.0)))             // the hapax doc: min_cnt = 1
  }

  test("tokenRarity reuses the exploded-scan exchange when the vocab " +
      "outgrows broadcast") {
    // the 100 TB shape: with a shuffle join on the token key, the
    // frequency branch's pre-agg exchange and the join's streaming-side
    // exchange hash-partition the SAME exploded projection — Catalyst
    // must reuse it, not scan/explode the corpus twice. (At broadcast
    // sizes the tf side broadcasts instead, which is also fine.)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val conf = spark.conf
    val prev = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = scala.util.Try(
        conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold"))
      .toOption.flatMap(Option(_))   // unset reads back as null
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val q = Curation.tokenRarity(docs)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("ReusedExchange"), plan.take(1500))
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      prevAqe match {
        case Some(v) =>
          conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None =>
          conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  test("dsirWeights: full bucket coverage; target-only vocabulary gets " +
      "positive weight, raw-only negative, and scores order accordingly") {
    // target speaks only of apples, the raw remainder only of bricks;
    // a small bucket space keeps the toy corpora from spreading thin
    val target = Seq((1L, "apple pie apple"), (2L, "apple tart"))
      .toDF("doc_id", "text")
    val rawOnly = Seq((3L, "brick wall brick"), (4L, "brick dust"))
      .toDF("doc_id", "text")
    val raw = target.unionByName(rawOnly)
    val w = Curation.dsirWeights(target, raw, numBuckets = 64)
    assert(w.count() === 64L)
    assert(w.select(countDistinct($"bucket")).head().getLong(0) === 64L)
    val scored = Curation.dsirScore(raw, w, numBuckets = 64)
      .orderBy($"doc_id")
      .select($"doc_id", $"score".cast("double"))
      .as[(Long, Double)].collect().toMap
    // every target doc must outscore every raw-only doc
    assert(Seq(1L, 2L).map(scored).min > Seq(3L, 4L).map(scored).max,
      scored.toString)
  }

  test("dsirResample: deterministic in seed, seed-sensitive, and " +
      "enriches the selection toward the target distribution") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val w = Curation.dsirWeights(docs.filter($"lang" === "en"), docs)
    def sel(seed: Long) = Curation.dsirResample(docs, w, n = 100, seed = seed)
      .select($"doc_id").as[Long].collect().toSet
    val a = sel(42L)
    assert(a.size === 100)
    assert(sel(42L) === a)                 // two runs, same draw
    assert(sel(43L) !== a)                 // the noise is seed-keyed
    val enRate = docs.filter($"lang" === "en").count().toDouble / docs.count()
    val selEnRate = docs.filter($"doc_id".isin(a.toSeq: _*))
      .filter($"lang" === "en").count().toDouble / 100.0
    // importance resampling toward the English target must beat the
    // base rate by a wide margin (base ≈ 0.44 at sf0.01)
    assert(selEnRate > enRate + 0.15, s"base $enRate, selected $selEnRate")
  }

  test("percentileNormalize: hand-computed pct, id tiebreak, 1-row group") {
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 30L), ("a", 3L, 20L),
      ("a", 4L, 30L),                       // ties with id 2 on value
      ("b", 9L, 999L))                      // singleton group
      .toDF("source", "doc_id", "score")
    val got = Curation.percentileNormalize(df, "source", "score", "doc_id")
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    // group a sorted by (score, id): 10(id1) 20(id3) 30(id2) 30(id4)
    assert(got === Map(1L -> 0.0, 3L -> (1.0 / 3), 2L -> (2.0 / 3),
      4L -> 1.0, 9L -> 0.5))
  }

  test("percentileNormalize: keepAbove takes the top fraction of EVERY group") {
    val df = (1L to 10L).map(i => ("a", i, i)) ++
      (1L to 4L).map(i => ("b", 100L + i, 1000L + i))
    val kept = Curation.percentileNormalize(df.toDF("source", "doc_id", "score"),
        "source", "score", "doc_id", keepAbove = 0.5)
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a: pct = (rn-1)/9 ≥ 0.5 → rn ≥ 5.5 → rn 6..10 (5 rows)
    // b: pct = (rn-1)/3 ≥ 0.5 → rn ≥ 2.5 → rn 3..4 (2 rows)
    assert(kept === Map("a" -> 5L, "b" -> 2L))
  }

  test("batch-tagged token-count sidecar: a deliberately double-appended " +
      "batch no longer inflates counts (exactly-once by construction)") {
    val docs = Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")
    val dir = s"target/tmp/tokcnt_tagged_spec_${System.nanoTime()}"
    graft.sources.Sinks.wipeForRebuild(spark, dir)
    Curation.writeTokenCountSidecar(docs.filter($"doc_id" === 1L),
      "text", dir, Some("b1"))
    Curation.writeTokenCountSidecar(docs.filter($"doc_id" === 2L),
      "text", dir, Some("b2"))
    def counts = Curation.mergedTokenCounts(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val clean = counts
    assert(clean === Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
    // the at-least-once replay that used to double-count
    Curation.writeTokenCountSidecar(docs.filter($"doc_id" === 1L),
      "text", dir, Some("b1"))
    assert(counts === clean)
    // compaction collapses the duplicate rows too and keeps the merge
    Curation.compactTokenCountSidecar(spark, dir)
    assert(counts === clean)
    // the legacy untagged sidecar still double-counts (the documented
    // contract this flip retires for tagged callers)
    val legacy = s"target/tmp/tokcnt_untagged_spec_${System.nanoTime()}"
    graft.sources.Sinks.wipeForRebuild(spark, legacy)
    Curation.writeTokenCountSidecar(docs.filter($"doc_id" === 1L),
      "text", legacy)
    Curation.writeTokenCountSidecar(docs.filter($"doc_id" === 1L),
      "text", legacy)
    assert(Curation.mergedTokenCounts(spark, legacy)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      === Map("a" -> 4L, "b" -> 2L))
  }
}
