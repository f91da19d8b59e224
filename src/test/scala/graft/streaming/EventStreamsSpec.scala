package graft.streaming

import graft.SparkSpec
import graft.queries.CoreQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** One arriving curation-shard row — the [[EventStreams
  * .runCurationShards]] feed shape (docs + the upstream feature
  * pipeline's scaled longs). Top-level so the product encoder derives
  * cleanly. */
final case class CurShardRow(doc_id: Long, source: String, text: String,
    __f0: Long, __f1: Long, __f2: Long, __f3: Long, __f4: Long,
    __f5: Long, __f6: Long, __y: Long)

class EventStreamsSpec extends SparkSpec {
  import EventStreams._
  import spark.implicits._

  def ts(minute: Int): Timestamp = Timestamp.valueOf(
    f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("hourlyAgg streaming matches the same transform run in batch") {
    val rows = Seq(
      Event(1, ts(5), 1, "click", 10.0),
      Event(2, ts(20), 2, "view", 5.0),
      Event(3, ts(65), 1, "click", 7.0),
      Event(4, ts(70), 3, "click", 1.0),
      // late watermark-advancing event so hour-0/hour-1 windows close
      Event(5, ts(300), 9, "view", 0.0))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(rows: _*)
    val streamed = runToMemory(hourlyAgg(mem.toDF()), "hourly_stream")
      .filter($"hour" < ts(180))
      .select($"hour", $"event_type", $"n", $"sum_value")
      .collect().map(_.toSeq).toSet

    val batch = hourlyAgg(rows.toDF())
      .filter($"hour" < ts(180))
      .select($"hour", $"event_type", $"n", $"sum_value")
      .collect().map(_.toSeq).toSet

    assert(streamed === batch)
    assert(streamed.contains(Seq(ts(0), "click", 1L, 10.0)))
    assert(streamed.contains(Seq(ts(60), "click", 2L, 8.0)))
  }

  test("dedupStream drops re-delivered event ids") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(1), 1, "click", 1.0),
      Event(1, ts(1), 1, "click", 1.0), // duplicate delivery
      Event(2, ts(2), 1, "view", 2.0))
    val got = runToMemory(dedupStream(mem.toDF()), "dedup_stream")
    assert(got.count() === 2)
  }

  test("dedupWithinWatermark drops re-deliveries with JITTERED timestamps") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(1), 1, "click", 1.0),
      Event(1, ts(4), 1, "click", 1.0),  // same id, later ts: retry jitter
      Event(2, ts(2), 1, "view", 2.0))
    val got = runToMemory(dedupWithinWatermark(mem.toDF()), "dedup_wwm")
    // ts-keyed dedupStream would keep 3 rows here; id-keyed keeps 2
    assert(got.count() === 2)
    assert(got.select("event_id").as[Long].collect().toSet === Set(1L, 2L))
  }

  test("AvailableNow drain: bounded batches, exactly-once across repeated drains") {
    val ingest = java.nio.file.Files.createTempDirectory("drain_ingest")
    val out = java.nio.file.Files.createTempDirectory("drain_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("drain_ckpt").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      ingest.resolve("a.parquet"))
    def src = readEventStream(spark, ingest.toString)
      .select($"event_id", $"user_id", $"value")
    drainAvailableNow(src, out, ckpt)
    assert(spark.read.parquet(out).count() === 1000)
    // drain again with no new input: nothing re-emitted
    drainAvailableNow(src, out, ckpt)
    assert(spark.read.parquet(out).count() === 1000)
    // new file lands; only it is drained
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf001/events.parquet"),
      ingest.resolve("b.parquet"))
    drainAvailableNow(src, out, ckpt)
    assert(spark.read.parquet(out).count() === 1000 + 10000)
  }

  test("sessionize closes sessions after the gap and emits on timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    // user 1: two events 10 min apart (one session), then 2h silence,
    // then another event (second session). The far-future event from
    // user 9 advances the watermark so both of user 1's sessions time out.
    mem.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 2.0),
      Event(3, ts(130), 1, "click", 4.0))
    mem.addData(Event(99, ts(2000), 9, "view", 0.0))

    val sessions = runToMemory(
      sessionize(mem.toDS().withWatermark("ts", "0 seconds"), gapMinutes = 30)
        .toDF(), "sessions")
      .filter($"user_id" === 1)
      .orderBy($"session_start")
      .collect()

    assert(sessions.length === 2)
    assert(sessions(0).getAs[Int]("n_events") === 2)
    assert(sessions(0).getAs[Double]("total_value") === 3.0)
    assert(sessions(1).getAs[Int]("n_events") === 1)
  }

  test("stream-static enrichment join matches the batch join") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id_dim", "tier")
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(1), 1, "click", 1.0),
      Event(2, ts(2), 2, "view", 2.0),
      Event(3, ts(3), 7, "click", 3.0)) // no dim row -> null tier
    val got = runToMemory(
      enrich(mem.toDF(), dim, "user_id", "user_id_dim")
        .select($"event_id", $"tier"), "enriched")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "gold"), (2L, "silver"), (3L, null)))
  }

  test("parquet sink with checkpoint: exactly-once across restart") {
    val ingest = java.nio.file.Files.createTempDirectory("sink_ingest")
    val out = java.nio.file.Files.createTempDirectory("sink_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sink_ckpt").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      ingest.resolve("a.parquet"))

    def passthrough = readEventStream(spark, ingest.toString)
      .select($"event_id", $"user_id", $"value")
    runToParquet(passthrough, out, ckpt)
    val n1 = spark.read.parquet(out).count()
    assert(n1 === 1000)

    // restart with the same checkpoint: old file NOT re-emitted, new one is
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf001/events.parquet"),
      ingest.resolve("b.parquet"))
    runToParquet(passthrough, out, ckpt)
    val back = spark.read.parquet(out)
    assert(back.count() === 1000 + 10000)
    assert(back.select("event_id").distinct().count() === 10000) // ids overlap across files
  }

  test("slidingAgg: events land in every overlapping window") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(50), 1, "click", 3.0), // in windows starting 0,15,30,45
      Event(2, ts(400), 9, "view", 0.0)) // watermark advancer
    val got = runToMemory(slidingAgg(mem.toDF()), "sliding_stream")
      .filter($"event_type" === "click")
      .select($"w_start", $"n", $"sum_value")
      .collect().map(_.toSeq).toSet
    val expected = Seq(0, 15, 30, 45).map(m => Seq(ts(m), 1L, 3.0)).toSet
    assert(got === expected)
  }

  test("stream-stream interval join: purchases within the trailing window only") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(10), 1, "purchase", 100.0), // 20 min before error: in
      Event(2, ts(29), 1, "purchase", 50.0),  // 1 min before error: in
      Event(3, ts(31), 1, "purchase", 25.0),  // AFTER the error: out
      Event(4, ts(30), 1, "error", 0.0),
      Event(5, ts(29), 2, "purchase", 9.0),   // other user: out
      Event(9, ts(500), 9, "view", 0.0))      // watermark advancer
    val got = runToMemory(errorPurchaseJoin(mem.toDF(), windowMinutes = 30),
      "ss_join_stream")
      .select($"err_id", $"p_id", $"p_value")
      .collect().map(_.toSeq).toSet
    assert(got === Set(Seq(4L, 1L, 100.0), Seq(4L, 2L, 50.0)))
  }

  test("streaming session windows match the batch session_window transform") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 2.0),  // same session (gap 10 < 30)
      Event(3, ts(60), 1, "click", 4.0),  // new session (gap 50 >= 30)
      Event(9, ts(600), 9, "view", 0.0))  // watermark advancer
    val got = runToMemory(sessionWindowAgg(mem.toDF()), "sess_win_stream")
      .filter($"user_id" === 1)
      .select($"s_start", $"s_end", $"n", $"sum_value")
      .collect().map(_.toSeq).toSet
    assert(got === Set(
      Seq(ts(0), ts(40), 2L, 3.0),   // [0, 10+30)
      Seq(ts(60), ts(90), 1L, 4.0))) // [60, 60+30)
  }

  test("foreachBatch upsert keeps the newest row per key across batches") {
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("upsert_out")
      .resolve("snap").toString
    val ckpt = java.nio.file.Files.createTempDirectory("upsert_ckpt").toString
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(1), 1, "click", 10.0),
      Event(2, ts(1), 2, "view", 20.0))
    runUpsertToParquet(mem.toDF(), Seq("event_id"), "ts", out, ckpt)
    mem.addData(
      Event(1, ts(5), 1, "click", 99.0),  // newer version of key 1
      Event(3, ts(2), 3, "click", 30.0))  // new key
    runUpsertToParquet(mem.toDF(), Seq("event_id"), "ts", out, ckpt)

    val snap = spark.read.parquet(out)
      .select($"event_id", $"value").as[(Long, Double)].collect().toMap
    assert(snap === Map(1L -> 99.0, 2L -> 20.0, 3L -> 30.0))
  }

  test("streaming sidecar dedup: later batches drop overlap with earlier " +
      "batches AND with the pre-seeded corpus") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("sdedup")
    val out = root.resolve("corpus").toString
    val sidecar = root.resolve("fp").toString
    val ckpt = root.resolve("ckpt").toString
    // pre-seed the sidecar from an existing corpus (the batch op)
    graft.ops.Dedup.writeFingerprintSidecar(
      Seq((100L, "preexisting doc")).toDF("doc_id", "text"), "text", sidecar)

    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, "fresh one"), (2L, "preexisting doc"), (3L, "fresh one"))
    runDedupToParquet(mem.toDF().toDF("doc_id", "text"),
      "text", "doc_id", out, sidecar, ckpt)
    mem.addData((10L, "fresh one"), (11L, "fresh two"))
    runDedupToParquet(mem.toDF().toDF("doc_id", "text"),
      "text", "doc_id", out, sidecar, ckpt)

    val got = spark.read.parquet(out)
      .select($"doc_id").as[Long].collect().toSet
    // batch 1: 1 survives ("fresh one", min id), 2 hits the seed, 3 is
    // an in-batch dup; batch 2: 10 hits batch 1's sidecar entry, 11 new
    assert(got === Set(1L, 11L))
  }

  test("streaming near-dup dedup: later batches drop near-dups of earlier " +
      "batches and of the pre-seeded corpus; novel docs survive") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("snear")
    val out = root.resolve("corpus").toString
    val sidecar = root.resolve("mh").toString
    val ckpt = root.resolve("ckpt").toString
    val long1 = (1 to 40).map(i => s"tok$i").mkString(" ")
    val novel = (1 to 40).map(i => s"fresh$i").mkString(" ")
    // pre-seed the signature sidecar from an existing corpus (batch op)
    graft.ops.Dedup.writeMinhashSidecar(
      Seq((100L, long1)).toDF("doc_id", "text"), "text", "doc_id", sidecar)

    val mem = MemoryStream[(Long, String)]
    mem.addData(
      (1L, ((1 to 39).map(i => s"tok$i") :+ "x").mkString(" ")), // near seed
      (2L, novel))                                               // novel
    runNearDupToParquet(mem.toDF().toDF("doc_id", "text"),
      "text", "doc_id", out, sidecar, ckpt, threshold = 0.5)
    mem.addData(
      (10L, ((1 to 39).map(i => s"fresh$i") :+ "y").mkString(" ")), // near 2
      (11L, (1 to 40).map(i => s"new$i").mkString(" ")))            // novel
    runNearDupToParquet(mem.toDF().toDF("doc_id", "text"),
      "text", "doc_id", out, sidecar, ckpt, threshold = 0.5)

    val got = spark.read.parquet(out)
      .select($"doc_id").as[Long].collect().toSet
    // batch 1: 1 near-dups the seed → drop, 2 survives; batch 2: 10
    // near-dups batch 1's survivor → drop, 11 survives
    assert(got === Set(2L, 11L))
  }

  test("streaming curation pipeline: two micro-batches == one-shot batch " +
      "replay on survivors, packed output, and state (near-dup sidecar → " +
      "quality gate → rolling budget → packing)") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("scuration")
    val twoDir = root.resolve("two").toString
    val oneDir = root.resolve("one").toString
    val ckpt = root.resolve("ckpt").toString
    def mk(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val corpusDoc = mk("corp", 40)
    // pre-seed BOTH pipelines' sidecars from the same existing corpus
    Seq(twoDir, oneDir).foreach { d =>
      graft.ops.Dedup.writeMinhashSidecar(
        Seq((900L, corpusDoc)).toDF("doc_id", "text"),
        "text", "doc_id", s"$d/minhash")
    }
    // 40-token synthetic docs score exactly 0.5 (len ok, tok-len ok, no
    // stopwords → 0.5 factor); minQuality 0.5 admits them; short docs
    // score below and drop at the quality gate
    val b1 = Seq(
      (1L, "web", mk("aa", 40)),     // good → packed
      (2L, "web", mk("bb", 40)),     // good → packed (web cum 80)
      (3L, "books", mk("cc", 40)),   // good → packed
      (4L, "web", ((1 to 39).map(i => s"corp$i") :+ "x").mkString(" ")),
      //            ^ near-dup of the seeded corpus → dropped at stage 1
      (5L, "web", mk("zz", 5)))      // low quality → dropped at stage 2
    val b2 = Seq(
      (11L, "web", mk("dd", 40)),    // web prior 80 + 40 > 100 → budget cut
      (12L, "books", mk("ee", 40)),  // books prior 40 + 40 ≤ 100 → packed
      (13L, "web", ((1 to 39).map(i => s"corp$i") :+ "z").mkString(" ")))
      //            ^ near-dup of the SEEDED corpus → dropped at stage 1 in
      //              both runs (a near-dup of a batch-1 survivor would be
      //              the documented intra-batch asymmetry: the one-shot
      //              replay doesn't collapse within a batch)
    val params = (2, 64, 8, 0.5, 0.5, 100L, 64L)

    // two micro-batches through the streaming query
    val mem = MemoryStream[(Long, String, String)]
    def run() = runCurationToParquet(
      mem.toDF().toDF("doc_id", "source", "text"),
      "text", "doc_id", "source", twoDir, ckpt,
      shingleK = params._1, numHashes = params._2, bands = params._3,
      nearDupThreshold = params._4, minQuality = params._5,
      tokensPerSource = params._6, seqTokens = params._7)
    mem.addData(b1: _*); run()
    mem.addData(b2: _*); run()

    // one-shot: the union as ONE batch through the same body
    curateBatch((b1 ++ b2).toDF("doc_id", "source", "text"),
      "text", "doc_id", "source", oneDir,
      params._1, params._2, params._3, params._4, params._5,
      params._6, params._7)

    def packed(d: String) = spark.read.parquet(s"$d/packed")
      .collect().map(_.toString).sorted.toSeq
    assert(packed(twoDir) === packed(oneDir))
    assert(spark.read.parquet(s"$twoDir/packed")
      .select($"doc_id").as[Long].collect().toSet === Set(1L, 2L, 3L, 12L))
    // cross-batch continuity: positions are one global token stream
    val cums = spark.read.parquet(s"$twoDir/packed")
      .orderBy($"doc_id").select($"cum_tokens").as[Long].collect().toSeq
    assert(cums === Seq(40L, 80L, 120L, 160L))
    // states converged identically
    def state(d: String, t: String) = spark.read.parquet(s"$d/$t")
      .collect().map(_.toString).sorted.toSeq
    assert(state(twoDir, "budget_state") === state(oneDir, "budget_state"))
    assert(state(twoDir, "pack_state") === state(oneDir, "pack_state"))
    assert(spark.read.parquet(s"$twoDir/pack_state")
      .head().getLong(0) === 160L)
  }

  test("streaming curation doc cap: per-source docsPerSource admits the " +
      "arrival prefix, cuts in-batch and cross-batch, two micro-batches " +
      "== one-shot") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("scuration_cap")
    val twoDir = root.resolve("two").toString
    val oneDir = root.resolve("one").toString
    val ckpt = root.resolve("ckpt").toString
    def mk(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    // all docs quality 0.5 / 40 tokens; budget (10k) never binds, so
    // every cut below is the DOC cap's
    val b1 = Seq(
      (1L, "web", mk("aa", 40)),    // web doc 1 → packed
      (2L, "web", mk("bb", 40)),    // web doc 2 → packed
      (3L, "books", mk("cc", 40)),  // books doc 1 → packed
      (5L, "web", mk("dd", 40)))    // web doc 3 > cap 2 → cut IN-batch
    val b2 = Seq(
      (11L, "web", mk("ee", 40)),   // web prior_docs 3 → cut CROSS-batch
      (12L, "books", mk("ff", 40))) // books doc 2 ≤ cap → packed
    val mem = MemoryStream[(Long, String, String)]
    def run() = runCurationToParquet(
      mem.toDF().toDF("doc_id", "source", "text"),
      "text", "doc_id", "source", twoDir, ckpt,
      tokensPerSource = 10000L, seqTokens = 64L, docsPerSource = 2L)
    mem.addData(b1: _*); run()
    mem.addData(b2: _*); run()
    curateBatch((b1 ++ b2).toDF("doc_id", "source", "text"),
      "text", "doc_id", "source", oneDir,
      2, 64, 8, 0.7, 0.5, 10000L, 64L, docsPerSource = 2L)

    def packed(d: String) = spark.read.parquet(s"$d/packed")
      .collect().map(_.toString).sorted.toSeq
    assert(packed(twoDir) === packed(oneDir))
    assert(spark.read.parquet(s"$twoDir/packed")
      .select($"doc_id").as[Long].collect().toSet === Set(1L, 2L, 3L, 12L))
    // seen_docs counts quality-KEPT docs (admitted or not): web saw 4
    val st = spark.read.parquet(s"$twoDir/budget_state")
      .select($"source", $"seen_docs").as[(String, Long)].collect().toMap
    assert(st === Map("web" -> 4L, "books" -> 2L))
    assert(spark.read.parquet(s"$twoDir/budget_state").columns.toSeq ===
      spark.read.parquet(s"$oneDir/budget_state").columns.toSeq)
  }

  test("curateBatch fault injection: a kill between the packed sink write " +
      "and the sidecar/state writes re-emits the batch on replay — " +
      "duplicates, never loss — and the rerun converges to one-shot") {
    val root = java.nio.file.Files.createTempDirectory("scuration_crash1")
    val crashDir = root.resolve("crash").toString
    val oneDir = root.resolve("one").toString
    def mk(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val b1 = Seq((1L, "web", mk("aa", 40)), (2L, "books", mk("bb", 40)))
    val b2 = Seq((11L, "web", mk("cc", 40)), (12L, "books", mk("dd", 40)))
    def runBatch(rows: Seq[(Long, String, String)], dir: String) =
      curateBatch(rows.toDF("doc_id", "source", "text"),
        "text", "doc_id", "source", dir,
        2, 64, 8, 0.7, 0.5, 10000L, 64L)

    // kill batch 1 right after the packed append — the first crash
    // window of the documented sink-first ordering
    EventStreams.failpoint = name =>
      if (name == "curateBatch:after-packed-append")
        throw new RuntimeException(s"injected crash: $name")
    val killed =
      try { runBatch(b1, crashDir); false }
      catch { case e: RuntimeException
        if e.getMessage.startsWith("injected crash") => true }
      finally { EventStreams.failpoint = _ => () }
    assert(killed)
    // torn state: the sink landed; sidecar and both states never did
    assert(spark.read.parquet(s"$crashDir/packed").count() === 2L)
    assert(!new java.io.File(s"$crashDir/minhash").exists)
    assert(!new java.io.File(s"$crashDir/budget_state").exists)
    assert(!new java.io.File(s"$crashDir/pack_state").exists)
    // the exception path released the writer lock (a hard process kill
    // would leave the marker for Sinks.breakDirLock)
    assert(!new java.io.File(crashDir + ".lock").exists)

    // at-least-once replay of batch 1, then batch 2; reference = the
    // union as one batch on a fresh dir
    runBatch(b1, crashDir)
    runBatch(b2, crashDir)
    runBatch(b1 ++ b2, oneDir)

    val crash = spark.read.parquet(s"$crashDir/packed")
    val one = spark.read.parquet(s"$oneDir/packed")
    // the replay saw the UN-advanced sidecar, budget, and offset, so it
    // re-derived byte-identical rows: the crash dir is exactly the
    // one-shot result plus a second copy of batch-1's packed rows
    val dupRows = one.filter($"doc_id" <= 2L).collect().map(_.toString).toSeq
    assert(crash.collect().map(_.toString).toSeq.sorted ===
      (one.collect().map(_.toString).toSeq ++ dupRows).sorted)
    // nothing lost, nothing foreign
    assert(crash.select($"doc_id").distinct().as[Long].collect().toSet ===
      Set(1L, 2L, 11L, 12L))
    // states converged to the one-shot values
    def state(d: String, t: String) = spark.read.parquet(s"$d/$t")
      .collect().map(_.toString).sorted.toSeq
    assert(state(crashDir, "budget_state") === state(oneDir, "budget_state"))
    assert(state(crashDir, "pack_state") === state(oneDir, "pack_state"))
  }

  test("curateBatch fault injection: a kill between the sidecar append and " +
      "the state writes leaves the replay with zero survivors and the next " +
      "batch overlapping positions — over-admission, never loss") {
    val root = java.nio.file.Files.createTempDirectory("scuration_crash2")
    val crashDir = root.resolve("crash").toString
    val oneDir = root.resolve("one").toString
    def mk(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val b1 = Seq((1L, "web", mk("aa", 40)), (2L, "web", mk("bb", 40)))
    val b2 = Seq((11L, "web", mk("cc", 40)))
    // budget 100: the one-shot cuts doc 11 (cum 120 > 100); the crash
    // dir's lost budget state re-admits it — the documented direction
    def runBatch(rows: Seq[(Long, String, String)], dir: String) =
      curateBatch(rows.toDF("doc_id", "source", "text"),
        "text", "doc_id", "source", dir,
        2, 64, 8, 0.7, 0.5, 100L, 64L)

    EventStreams.failpoint = name =>
      if (name == "curateBatch:after-sidecar-append")
        throw new RuntimeException(s"injected crash: $name")
    val killed =
      try { runBatch(b1, crashDir); false }
      catch { case e: RuntimeException
        if e.getMessage.startsWith("injected crash") => true }
      finally { EventStreams.failpoint = _ => () }
    assert(killed)
    // torn state: sink AND sidecar landed; budget/pack states did not
    assert(spark.read.parquet(s"$crashDir/packed").count() === 2L)
    assert(new java.io.File(s"$crashDir/minhash").exists)
    assert(!new java.io.File(s"$crashDir/budget_state").exists)
    assert(!new java.io.File(s"$crashDir/pack_state").exists)

    // replay: every batch-1 row is now an exact dup of the sidecar →
    // zero survivors, no new packed rows; the states land, recording
    // zero seen (the crashed batch's contribution is unrecoverable —
    // that is the overlap hazard the scaladoc names, not row loss)
    runBatch(b1, crashDir)
    assert(spark.read.parquet(s"$crashDir/packed").count() === 2L)
    assert(spark.read.parquet(s"$crashDir/pack_state").head().getLong(0) === 0L)

    runBatch(b2, crashDir)
    runBatch(b1 ++ b2, oneDir)
    val crash = spark.read.parquet(s"$crashDir/packed")
    // never loss: batch 1's rows and batch 2's row are all present...
    assert(crash.select($"doc_id").as[Long].collect().toSet ===
      Set(1L, 2L, 11L))
    // ...but doc 11 was OVER-admitted (one-shot budget cuts it) and its
    // position overlaps the crashed batch's stream (offset restarted)
    assert(spark.read.parquet(s"$oneDir/packed")
      .select($"doc_id").as[Long].collect().toSet === Set(1L, 2L))
    assert(crash.filter($"doc_id" === 11L)
      .select($"cum_tokens").as[Long].head() === 40L)
  }

  test("streaming token-count sidecar: merged counts and rarity scores " +
      "equal the one-shot batch build (exact counts are additive)") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("stokcnt")
    val sidecar = root.resolve("tf").toString
    val ckpt = root.resolve("ckpt").toString
    val b1 = Seq((1L, "the cat sat"), (2L, "the dog sat here"))
    val b2 = Seq((3L, "the cat ran"), (4L, "a rare hapax"))
    val mem = MemoryStream[(Long, String)]
    mem.addData(b1: _*)
    runTokenCountsToSidecar(mem.toDF().toDF("doc_id", "text"),
      "text", sidecar, ckpt)
    mem.addData(b2: _*)
    runTokenCountsToSidecar(mem.toDF().toDF("doc_id", "text"),
      "text", sidecar, ckpt)
    graft.ops.Curation.compactTokenCountSidecar(spark, sidecar)

    val union = (b1 ++ b2).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"doc_id").collect().map(_.toString).toSeq
    assert(canon(graft.ops.Curation
        .tokenRarityAgainstSidecar(union, sidecar)) ===
      canon(graft.ops.Curation.tokenRarity(union)))
    // merged table == one-shot frequency table, and compaction left
    // exactly one row per token
    val merged = graft.ops.Curation.mergedTokenCounts(spark, sidecar)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(merged("the") === 3L && merged("hapax") === 1L)
    assert(spark.read.parquet(sidecar).groupBy($"w").count()
      .filter($"count" > 1).count() === 0L)
  }

  test("streaming Gram sidecar: weights fitted after micro-batched appends " +
      "are bit-equal to a from-scratch fit over everything ingested") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("sgram")
    val sidecar = root.resolve("gram").toString
    val ckpt = root.resolve("ckpt").toString
    // per-row [0,1] features (the LinearProbe convergence contract);
    // deterministic synthetic rows so the fit is non-trivial
    val rows = (1L to 60L).map { i =>
      (i, (i % 7).toDouble / 7.0, (i % 3).toDouble / 3.0,
        if (i % 2 == 0) 1L else 0L)
    }
    val (b1, b2) = rows.splitAt(25)
    val mem = MemoryStream[(Long, Double, Double, Long)]
    def run() = runGramToSidecar(
      mem.toDF().toDF("id", "fa", "fb", "y"),
      Seq("fa", "fb"), "y", sidecar, ckpt)
    mem.addData(b1: _*); run()
    mem.addData(b2: _*); run()
    graft.ops.LinearProbe.compactGramSidecar(spark, sidecar, 3)
    val streamed = graft.ops.LinearProbe.fitFromSidecar(
      spark, sidecar, 3, iters = 24)
    val oneShot = graft.ops.LinearProbe.fit(
      rows.toDF("id", "fa", "fb", "y"), Seq("fa", "fb"),
      $"y", iters = 24)
    assert(streamed.toSeq === oneShot.toSeq)
    // compaction left exactly one moment row
    assert(spark.read.parquet(sidecar).count() === 1L)
  }

  test("streaming seeded-IVF ingest: index state after micro-batched appends " +
      "equals one full assignment under the stored centroids") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("sivf")
    val dir = root.resolve("idx").toString
    val ckpt = root.resolve("ckpt").toString
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    // build on the first quarter (the batch op), stream the rest in
    // two micro-batches of (id, vec) rows
    val built = emb.filter($"vec_id" % 4 === 0)
    // tagged base (round 18): the streaming runner appends tagged
    // micro-batches, which requires a tagged vectors table
    graft.ops.SeededKMeans.buildIvfIndexSeeded(built, "vec_id", "embedding",
      dir, nlist = 4, iters = 3, batchId = Some("base"))
    val rest = emb.filter($"vec_id" % 4 =!= 0)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toSeq
    val (b1, b2) = rest.splitAt(rest.size / 2)
    val mem = MemoryStream[(Long, Seq[Double])]
    def run() = runIvfIngestSeeded(
      mem.toDF().toDF("vec_id", "embedding"), dir, ckpt)
    mem.addData(b1: _*); run()
    mem.addData(b2: _*); run()

    val model = graft.ops.SeededKMeans.fit(built, "vec_id", "embedding",
      k = 4, iters = 3)
    val expected = model.assign(emb, "embedding")
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toSet
    val stored = spark.read.parquet(s"$dir/vectors")
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toSet
    assert(stored === expected)
  }

  test("streaming postings sidecar: BM25 ranking off the sidecar equals " +
      "the one-shot batch build (docs arrive whole per micro-batch)") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("spostings")
    val sidecar = root.resolve("idx").toString
    val ckpt = root.resolve("ckpt").toString
    val b1 = Seq((1L, "apple banana apple"), (2L, "banana cherry"))
    val b2 = Seq((3L, "cherry cherry cherry cherry"))
    val mem = MemoryStream[(Long, String)]
    def run() = runPostingsToSidecar(mem.toDF().toDF("doc_id", "text"),
      sidecar, ckpt)
    mem.addData(b1: _*); run()
    mem.addData(b2: _*); run()
    graft.ops.Retrieval.compactPostingsSidecar(spark, sidecar)

    val union = (b1 ++ b2).toDF("doc_id", "text")
    val queries = Seq((0L, "apple cherry")).toDF("query_id", "query_text")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select($"query_id", $"doc_id", $"score".cast("double"), $"n_terms", $"rnk")
      .orderBy($"query_id", $"rnk").collect().map(_.toString).toSeq
    assert(canon(graft.ops.Retrieval
        .bm25TopKFromSidecar(spark, sidecar, queries, k = 3)) ===
      canon(graft.ops.Retrieval.bm25TopK(union, queries, k = 3)))
  }

  test("streaming histogram sidecar: merged histogram and quantiles equal " +
      "the one-shot build (additive counts)") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("shist")
    val sidecar = root.resolve("h").toString
    val ckpt = root.resolve("ckpt").toString
    val b1 = (0 until 200).map(i => ("g" + i % 2, i.toDouble))
    val b2 = (200 until 500).map(i => ("g" + i % 2, i.toDouble))
    val mem = MemoryStream[(String, Double)]
    def run() = runHistToSidecar(mem.toDF().toDF("g", "v"),
      Seq("g"), "v", sidecar, ckpt, lo = 0.0, hi = 500.0, bins = 50)
    mem.addData(b1: _*); run()
    mem.addData(b2: _*); run()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val union = (b1 ++ b2).toDF("g", "v")
    assert(canon(graft.ops.Sketches.mergedHistogram(spark, sidecar, Seq("g")))
      === canon(graft.ops.Sketches.histogram(union, Seq("g"), "v",
        0.0, 500.0, 50)))
    assert(canon(graft.ops.Sketches.histQuantiles(
        graft.ops.Sketches.mergedHistogram(spark, sidecar, Seq("g")),
        Seq("g"), Seq(0.5, 0.9), 0.0, 500.0, 50))
      === canon(graft.ops.Sketches.histQuantiles(
        graft.ops.Sketches.histogram(union, Seq("g"), "v", 0.0, 500.0, 50),
        Seq("g"), Seq(0.5, 0.9), 0.0, 500.0, 50)))
  }

  test("streaming sketch sidecar: merged estimates equal a from-scratch " +
      "batch build over everything ingested (lossless union)") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("ssketch")
    val sidecar = root.resolve("s").toString
    val ckpt = root.resolve("ckpt").toString
    val b1 = (0 until 300).map(i => (s"src${i % 3}", s"v$i"))
    val b2 = (200 until 500).map(i => (s"src${i % 3}", s"v$i")) // overlap
    val mem = MemoryStream[(String, String)]
    mem.addData(b1: _*)
    runSketchToSidecar(mem.toDF().toDF("source", "value"),
      Seq("source"), "value", sidecar, ckpt)
    mem.addData(b2: _*)
    runSketchToSidecar(mem.toDF().toDF("source", "value"),
      Seq("source"), "value", sidecar, ckpt)

    def canonEst(df: org.apache.spark.sql.DataFrame) = df
      .select($"source", $"n_rows", $"approx_distinct")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val streamed = canonEst(
      graft.ops.Sketches.mergedDistinct(spark, sidecar, Seq("source")))
    // n_rows exact too (round 18: the runner tags micro-batches, so
    // the counts carry the exactly-once contract, not just the
    // duplicate-insensitive estimates)
    val batch = canonEst(
      graft.ops.Sketches.distinctSketches(
          (b1 ++ b2).toDF("source", "value"), Seq("source"), "value")
        .select($"source", $"n_rows", org.apache.spark.sql.functions
          .hll_sketch_estimate($"sketch").as("approx_distinct")))
    assert(streamed === batch)
  }

  test("file-source stream over events.parquet matches batch q14 counts") {
    // stage the parquet file into an ingestion directory (file streams
    // watch directories, not single files)
    val ingest = java.nio.file.Files.createTempDirectory("events_ingest")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      ingest.resolve("part-0.parquet"))
    val streamed = runToMemory(
      hourlyAgg(readEventStream(spark, ingest.toString)), "hourly_file_stream")
    // append mode only emits windows the watermark closed; the final
    // open windows stay in state, so streamed <= batch and every
    // emitted row must match the batch result exactly.
    val batch = CoreQueries.q14EventsHourly.fn(spark, sf0001)
      .select(col("hour"), col("event_type"), col("n"))
      .collect().map(_.toSeq).toSet
    val got = streamed
      .select(col("hour").cast("string"), col("event_type"), col("n"))
      .collect().map(_.toSeq).toSet
    assert(got.nonEmpty)
    assert(got.subsetOf(batch))
  }

  test("streaming bigram-LM sidecar: cross-entropy scored off the merged " +
      "counts equals the one-shot self-trained scoring") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("sbglm")
    val sidecar = root.resolve("lm").toString
    val ckpt = root.resolve("ckpt").toString
    val b1 = Seq((1L, "the cat sat on the mat"), (2L, "the dog sat here"))
    val b2 = Seq((3L, "the cat ran far"), (4L, "mat cat the on sat the"))
    val mem = MemoryStream[(Long, String)]
    def run() = runBigramLmToSidecar(mem.toDF().toDF("doc_id", "text"),
      "text", sidecar, ckpt)
    mem.addData(b1: _*); run()
    mem.addData(b2: _*); run()
    graft.ops.TextAnalysis.compactBigramSidecar(spark, sidecar)
    val union = (b1 ++ b2).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"doc_id").collect().map(_.toString).toSeq
    assert(canon(graft.ops.TextAnalysis.lmCrossEntropyFromSidecar(
        spark, sidecar, union, "doc_id", "text")) ===
      canon(graft.ops.TextAnalysis.lmCrossEntropy(union, "doc_id", "text")))
  }

  test("streaming gram sidecar: a probe fitted from two streamed " +
      "feature micro-batches equals the one-shot fit bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("sgram")
    val sidecar = root.resolve("gram").toString
    val ckpt = root.resolve("ckpt").toString
    // scaled shape: (__f0 intercept, __f1 feature, __y label)
    val b1 = Seq((1000000L, 0L, 0L), (1000000L, 500000L, 1L))
    val b2 = Seq((1000000L, 1000000L, 1L))
    val mem = MemoryStream[(Long, Long, Long)]
    def run() = runGramToSidecar(mem.toDF().toDF("__f0", "__f1", "__y"),
      2, sidecar, ckpt)
    mem.addData(b1: _*); run()
    mem.addData(b2: _*); run()
    graft.ops.LinearProbe.compactGramSidecar(spark, sidecar, 2)
    val streamed = graft.ops.LinearProbe.fitFromSidecar(
      spark, sidecar, 2, iters = 2)
    val oneShot = {
      val df = (b1 ++ b2).toDF("__f0", "__f1", "__y")
      val (g, b, n) = graft.ops.LinearProbe.gram(df, 2)
      graft.ops.LinearProbe.fitFromGram(g, b, n, iters = 2)
    }
    assert(streamed.toSeq === oneShot.toSeq)
    // and both equal the hand-worked recurrence (LinearProbeSpec)
    assert(streamed.toSeq === Seq(BigInt(276041666), BigInt(216145833)))
  }

  test("streaming edge sidecar: PageRank off the merged edge set equals " +
      "the direct build — including after an at-least-once REPLAY of a " +
      "batch (set-union appends are idempotent)") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("sedges")
    val sidecar = root.resolve("edges").toString
    val ckpt = root.resolve("ckpt").toString
    val b1 = Seq((1L, 2L), (2L, 1L))
    val b2 = Seq((2L, 3L), (3L, 2L), (2L, 1L))
    val mem = MemoryStream[(Long, Long)]
    def run() = runEdgesToSidecar(mem.toDF().toDF("src", "dst"),
      "src", "dst", sidecar, ckpt)
    mem.addData(b1: _*); run()
    mem.addData(b2: _*); run()
    // simulate the at-least-once replay: append batch 2 again directly
    graft.ops.Graph.writeEdgeSidecar(b2.toDF("src", "dst"),
      "src", "dst", sidecar)
    val direct = graft.ops.Graph.pageRankFp(
        (b1 ++ b2).toDF("src", "dst"), "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val fromSidecar = graft.ops.Graph.pageRankFromEdgeSidecar(spark, sidecar)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fromSidecar === direct)
  }

  test("streaming curation shards: two foreachBatch-ingested monotone " +
      "shards + one finalize equal the one-shot q218 pipeline") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("scur")
    val dirs = graft.ops.CurationPipeline.Dirs(root.resolve("pipe").toString)
    val ckpt = root.resolve("ckpt").toString
    val sf = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, sf)
    val holdout = $"doc_id" % 19 === 0
    // the registry freezes BEFORE the stream starts (the contract)
    graft.ops.CurationPipeline.init(spark, dirs, docs.filter(holdout))
    val rows = docs.select($"doc_id", $"source", $"text")
      .join(graft.queries.CurationQueries.probeScaled(spark, sf), "doc_id")
      .as[CurShardRow].collect().sortBy(_.doc_id)
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val mem = MemoryStream[CurShardRow]
    def run() = runCurationShards(mem.toDF(), dirs, holdout, ckpt)
    mem.addData(b1.toSeq: _*); run()
    mem.addData(b2.toSeq: _*); run()
    val streamed = graft.ops.CurationPipeline.finalizePipeline(spark, dirs)
      .collect().map(_.toString).sorted.toSeq
    val oneShot = graft.queries.CurationQueries.q218CurationPipeline
      .fn(spark, sf).collect().map(_.toString).sorted.toSeq
    assert(streamed.nonEmpty && streamed === oneShot)
  }
}
