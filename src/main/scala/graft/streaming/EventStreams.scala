package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the events table. The transforms are
  * written against plain DataFrames so the SAME logic runs in batch
  * (the oracle-checked q14 path) and as an incremental streaming query
  * — Spark's unified model. Streaming adds: watermarks for state
  * eviction, windowed aggregation in append mode, stream dedup, and
  * custom session state via flatMapGroupsWithState.
  *
  * Scale: state is partitioned by grouping key across executors; the
  * watermark bounds state size, so a 100 TB/day stream holds only the
  * open windows/sessions in memory.
  */
object EventStreams {

  /** Test-only fault-injection seam for [[curateBatch]]'s crash-
    * ordering contract: invoked with a window name at the two points
    * inside the write section where a process death would tear the
    * batch (after the packed sink append; after the sidecar append).
    * Production value is a no-op; the fault-injection spec swaps in a
    * thrower and restores it in a finally — the thrown exception
    * aborts the remaining writes exactly like a kill would, while
    * `Sinks.withDirLock` still releases the lock the way a crashed
    * holder's marker would be cleared with `breakDirLock`. */
  @volatile private[graft] var failpoint: String => Unit = _ => ()

  /** Event schema with `ts` stored as `tsType` — the file-source
    * stream needs a pinned schema, and that schema must match the
    * files' physical encoding or the source silently reads nulls. The
    * encoding is probed from the landing zone (see
    * [[readEventStream]]), never assumed. */
  def rawSchemaFor(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Schema of the current writer format (TIMESTAMP_NTZ micros). */
  val rawSchema: StructType = rawSchemaFor(TimestampNTZType)

  /** File-source stream of an events-parquet ingestion directory (new
    * files picked up incrementally — the standard landing-zone shape).
    *
    * The `ts` encoding is read from the footer of whatever file is
    * already in the directory (one bounded batch-read of the schema,
    * not the data) and normalized exactly like the batch reader
    * ([[graft.sources.Tables.normalizeEventTs]]) — legacy INT64-nanos
    * files and TIMESTAMP_NTZ-micros files both stream as
    * TimestampType. An empty landing zone defaults to the current
    * writer format. */
  def readEventStream(spark: SparkSession, ingestDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType = scala.util.Try(
      spark.read.parquet(ingestDir).schema("ts").dataType)
      .getOrElse(TimestampNTZType)
    val normalized = graft.sources.Tables.normalizeEventTs(
      spark.readStream.schema(rawSchemaFor(tsType)).parquet(ingestDir))
    // Encoding-mismatch tripwire (round-9 ADVICE): the probe above runs
    // once at stream SETUP; if the zone was empty then and the first
    // files to arrive carry a DIFFERENT physical ts encoding, the
    // pinned-schema file source reads null ts for every row — watermark
    // operators would then silently drop the whole stream. An event's
    // ts is contractually non-null (it IS the event time), so any null
    // after normalization can only be that mismatch: fail loud with a
    // named error instead of streaming nulls.
    normalized.withColumn("ts",
      when(col("ts").isNotNull, col("ts")).otherwise(raise_error(lit(
        s"readEventStream: null ts after normalization — landing-zone " +
          s"file encoding does not match the schema probed at stream " +
          s"setup ($tsType); restart the stream after the first files " +
          s"land, or align the writer encoding"))))
  }

  /** Tumbling-window aggregation with a watermark: count + sum(value)
    * per (1h window, event_type). Works on batch and stream alike. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"),
        col("sum_value"))

  /** Streaming exact dedup on event_id within the watermark horizon —
    * the streaming twin of [[graft.ops.Dedup.exactDedup]]. */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours").dropDuplicates("event_id", "ts")

  /** Streaming dedup for LATE duplicates: unlike [[dedupStream]]
    * (whose key includes `ts`, so the same event_id re-delivered with
    * a different timestamp survives), this keeps state per event_id
    * alone and drops any re-delivery arriving within the watermark
    * delay of the first sighting. State is evicted by the watermark —
    * bounded by the id-arrival rate × delay, not the stream length —
    * which is the production retry-dedup pattern (at-least-once
    * sources re-send with jittered timestamps). */
  def dedupWithinWatermark(events: DataFrame, delay: String = "2 hours"): DataFrame =
    events.withWatermark("ts", delay).dropDuplicatesWithinWatermark("event_id")

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
                         user_id: Long, event_type: String, value: Double)
  final case class SessionState(start: Long, end: Long, n: Int, sum: Double)
  final case class UserSession(user_id: Long, session_start: Long,
                               session_end: Long, n_events: Int,
                               total_value: Double)

  /** Custom stateful sessionization: per-user sessions closed after
    * `gapMinutes` of inactivity, emitted on timeout. Demonstrates
    * arbitrary state (KeyValueGroupedDataset.flatMapGroupsWithState)
    * for semantics windowed aggregation can't express. */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30)
      : Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L

    def update(userId: Long, evs: Iterator[Event],
               state: GroupState[SessionState]): Iterator[UserSession] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(UserSession(userId, s.start, s.end, s.n, s.sum))
      } else {
        val sorted = evs.toSeq.sortBy(_.ts.getTime)
        var closed = List.empty[UserSession]
        var cur = state.getOption
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.end <= gapMs =>
              cur = Some(s.copy(end = t, n = s.n + 1, sum = s.sum + e.value))
            case Some(s) =>
              closed ::= UserSession(userId, s.start, s.end, s.n, s.sum)
              cur = Some(SessionState(t, t, 1, e.value))
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.end + gapMs)
        }
        closed.reverseIterator
      }
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Stream-static enrichment join: each event picks up the
    * dimension row for its user. The static side is broadcast per
    * micro-batch (no stream state); works identically in batch. */
  def enrich(events: DataFrame, dim: DataFrame, eventKey: String,
             dimKey: String): DataFrame =
    events.join(broadcast(dim), events(eventKey) === dim(dimKey), "left_outer")

  /** Sliding-window aggregation: overlapping windows (`length` every
    * `slide`) per event_type — each event contributes to
    * length/slide windows; the watermark bounds open-window state. */
  def slidingAgg(events: DataFrame, length: String = "1 hour",
                 slide: String = "15 minutes"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), length, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"),
        col("sum_value"))

  /** Stream-stream interval join: each error event picks up purchases
    * of the same user from the trailing `windowMinutes` — both sides
    * watermarked, and the time-bound predicate lets Spark evict
    * buffered rows once the watermark passes (bounded state; an
    * unbounded stream-stream equi-join would buffer forever). */
  def errorPurchaseJoin(events: DataFrame, windowMinutes: Int = 30): DataFrame = {
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id").as("err_user"),
        col("ts").as("err_ts"))
      .withWatermark("err_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value").as("p_value"))
      .withWatermark("p_ts", "1 hour")
    errors.join(purchases,
      col("err_user") === col("p_user") &&
        col("p_ts") <= col("err_ts") &&
        col("p_ts") >= col("err_ts") - expr(s"INTERVAL $windowMinutes MINUTES"))
  }

  /** Exactly-once parquet sink: append-mode file sink with a
    * checkpoint — restarts resume from the checkpointed offsets
    * without re-emitting (the production landing path; the memory
    * sink below is the local smoke path). Blocks until all currently
    * available input is processed, then stops. */
  def runToParquet(df: DataFrame, outDir: String, checkpointDir: String): Unit = {
    val q = df.writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Streaming session windows: the built-in dynamic-gap windows
    * (same transform as batch q88), watermarked so closed sessions
    * are emitted and evicted in append mode. */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("user_id"), col("sw.start").as("s_start"),
        col("sw.end").as("s_end"), col("n"), col("sum_value"))

  /** foreachBatch keyed upsert — the MERGE pattern for plain parquet:
    * per micro-batch, merge the batch into the snapshot keeping the
    * newest row per key (by `tsCol`, batch wins ties). The merged
    * frame is eagerly localCheckpoint-ed to sever lineage from the
    * files being overwritten. Idempotent per key, so batch replays
    * (at-least-once foreachBatch) converge to the same snapshot. */
  def runUpsertToParquet(df: DataFrame, keyCols: Seq[String], tsCol: String,
                         outDir: String, checkpointDir: String): Unit = {
    val q = df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // existence via the Hadoop FileSystem for the path's scheme —
        // java.io.File only sees the local FS, and a false negative
        // here silently replaces the snapshot with just this batch
        val outPath = new org.apache.hadoop.fs.Path(outDir)
        val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val existing =
          if (fs.exists(outPath))
            spark.read.parquet(outDir).withColumn("__new", lit(0))
          else batch.limit(0).withColumn("__new", lit(0))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keyCols.map(col): _*)
          .orderBy(col(tsCol).desc, col("__new").desc)
        val merged = existing
          .unionByName(batch.withColumn("__new", lit(1)))
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .drop("__rn", "__new")
          .localCheckpoint(true)
        merged.write.mode("overwrite").parquet(outDir)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Batch-over-stream: process EVERYTHING currently available in
    * bounded micro-batches, then stop — Trigger.AvailableNow, the
    * scheduled-ingest pattern (a cron'd job drains the landing zone
    * with streaming-checkpoint exactly-once semantics, without a
    * long-running cluster). `maxFilesPerTrigger` bounds each batch so
    * a large backlog cannot OOM a drain run. */
  def drainAvailableNow(df: DataFrame, outDir: String,
                        checkpointDir: String): Unit = {
    val q = df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()
    q.awaitTermination()
  }

  /** Streaming incremental corpus dedup — the continuous form of
    * [[graft.ops.Dedup.dedupAgainstSidecar]]: every micro-batch of
    * documents is anti-joined against the persisted fingerprint
    * sidecar, survivors append to the corpus sink, and the survivors'
    * fingerprints append to the sidecar so LATER batches (and later
    * runs — the sidecar outlives the query) drop them. Cross-batch
    * exactness that `dropDuplicates` state cannot give: streaming
    * state dies with the checkpoint, the sidecar is the corpus's
    * permanent memory.
    *
    * Crash safety under at-least-once foreachBatch: survivors reach
    * `outDir` BEFORE their fingerprints reach the sidecar
    * ([[graft.ops.Dedup.dedupAgainstSidecarTo]]). A replay of a fully
    * committed batch finds its fingerprints persisted and contributes
    * zero survivors (idempotent); a crash BETWEEN the two writes makes
    * the replay re-emit that batch's survivors — duplicate output
    * rows, recoverable downstream — never silent loss (the reverse
    * order would admit zero survivors on replay and permanently drop
    * the documents). Single-writer per sidecar: run ONE such query per
    * sidecar dir — concurrent writers could double-admit survivors.
    * `bloomPrefilter = true` routes membership through the sidecar's
    * Bloom companion when present (build it once with
    * [[graft.ops.Dedup.writeSidecarBloom]]; each batch folds its new
    * fingerprints forward) — the 100 TB path where most of every
    * micro-batch is genuinely new and skips the exact anti-join. */
  def runDedupToParquet(docs: DataFrame, textCol: String, idCol: String,
                        outDir: String, sidecarDir: String,
                        checkpointDir: String,
                        bloomPrefilter: Boolean = false): Unit = {
    val q = docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.ops.Dedup.dedupAgainstSidecarTo(batch, textCol, idCol,
          sidecarDir, outDir, bloomPrefilter)
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Streaming incremental NEAR-dup dedup — the fuzzy twin of
    * [[runDedupToParquet]], continuous form of [[graft.ops.Dedup
    * .nearDupAgainstSidecar]]: each micro-batch near-dup-checks
    * against the persisted minhash-signature sidecar (band-key
    * equality join + signature-agreement estimator — corpus text
    * never re-read), survivors append to the corpus sink, and the
    * survivors' signatures append to the sidecar so later batches AND
    * later runs drop their near-dups. Same crash direction as the
    * exact twin (sink-first writes: replays re-admit, never lose) and
    * the same single-writer-per-sidecar restriction. Intra-batch
    * near-dups are not collapsed (the documented
    * [[graft.ops.Dedup.nearDupAgainstSidecar]] contract).
    *
    * `shingleK`/`numHashes`/`bands` MUST match the parameters the
    * sidecar was built with ([[graft.ops.Dedup.writeMinhashSidecar]]):
    * band keys are a function of all three, so a mismatch silently
    * generates no candidates (and a signature-length mismatch skews
    * the agreement estimator) — the same contract every
    * reader/appender of the sidecar shares. */
  def runNearDupToParquet(docs: DataFrame, textCol: String, idCol: String,
                          outDir: String, sidecarDir: String,
                          checkpointDir: String,
                          shingleK: Int = 2, numHashes: Int = 64,
                          bands: Int = 8,
                          threshold: Double = 0.7): Unit = {
    val q = docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.ops.Dedup.nearDupAgainstSidecarTo(batch, textCol, idCol,
          sidecarDir, outDir, shingleK = shingleK, numHashes = numHashes,
          bands = bands, threshold = threshold)
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Streaming twin of the composed curation pipeline (the batch form
    * is q131's `curationPipeline`): every micro-batch runs
    *
    *   near-dup sidecar dedup → per-row quality gate → per-source
    *   rolling token budget → packed-sequence append
    *
    * incrementally, with all cross-batch state in three tiny persisted
    * tables under `pipelineDir` (never in streaming state — the
    * pipeline's memory outlives the query and any checkpoint):
    *
    *  - `minhash/` — the near-dup signature sidecar
    *    ([[graft.ops.Dedup.writeMinhashSidecar]] layout);
    *  - `budget_state/` — (source, seen_tokens, seen_docs): the
    *    running quality-kept token AND document counts per source.
    *    Admission is prefix-by-arrival on BOTH: a row is admitted
    *    while the source's seen token total stays ≤ `tokensPerSource`
    *    AND its seen doc count stays ≤ `docsPerSource` (the streaming
    *    twin of [[graft.ops.Curation.capPerSource]]'s no-domain-
    *    dominates rule — arrival-order prefix instead of the batch
    *    op's seeded uniform sample, because a stream cannot
    *    retroactively un-admit). Both counters include earlier
    *    REJECTED rows — the running-cum-≤-budget rule of the batch
    *    mixture stage, which is what makes incremental == one-shot;
    *  - `pack_state/` — the global token offset the next batch's
    *    packing continues from.
    *
    * Determinism contract: with batches arriving in `idCol` order
    * (a sorted landing zone — the same assumption the exact sidecar's
    * min-id survivor rule makes), processing N batches yields
    * BYTE-identical packed output and state to processing their union
    * as one batch (EventStreamsSpec proves two-batch == one-shot).
    * Near-dups are dropped against the SIDECAR (corpus + earlier
    * batches); intra-batch near-dups are not collapsed (the documented
    * [[graft.ops.Dedup.nearDupAgainstSidecar]] contract) — compose a
    * batch-level clusterer upstream when that matters.
    *
    * Crash ordering (at-least-once foreachBatch), sink-first like every
    * incremental op here: packed rows append BEFORE the sidecar and
    * state writes. A crash before the sidecar append re-emits the
    * batch on replay (duplicate packed rows — recoverable); a crash
    * between the sidecar append and the state writes makes the replay
    * contribute zero survivors and leaves the states un-advanced, so
    * the NEXT batch's sequence positions overlap the crashed batch's
    * tail — duplicates/overlap, never silent loss; rebuild the packed
    * output from the corpus when exact positions matter. Single writer
    * per pipelineDir (the sidecar appends enforce it via the
    * `.lock` marker). */
  def runCurationToParquet(docs: DataFrame, textCol: String, idCol: String,
                           sourceCol: String, pipelineDir: String,
                           checkpointDir: String,
                           shingleK: Int = 2, numHashes: Int = 64,
                           bands: Int = 8, nearDupThreshold: Double = 0.7,
                           minQuality: Double = 0.5,
                           tokensPerSource: Long = 1000L,
                           seqTokens: Long = 256L,
                           docsPerSource: Long = Long.MaxValue): Unit = {
    val q = docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        curateBatch(batch, textCol, idCol, sourceCol, pipelineDir,
          shingleK, numHashes, bands, nearDupThreshold, minQuality,
          tokensPerSource, seqTokens, docsPerSource)
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** One micro-batch of [[runCurationToParquet]] — exposed so the
    * one-shot batch replay (the equality spec's reference) runs the
    * same body. */
  private[graft] def curateBatch(batch: DataFrame, textCol: String,
      idCol: String, sourceCol: String, pipelineDir: String,
      shingleK: Int, numHashes: Int, bands: Int, nearDupThreshold: Double,
      minQuality: Double, tokensPerSource: Long, seqTokens: Long,
      docsPerSource: Long = Long.MaxValue): Unit = {
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(pipelineDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def exists(p: String) = fs.exists(new org.apache.hadoop.fs.Path(p))

    // stage 1: near-dup dedup against the persisted sidecar (survivors
    // are checkpointed inside; signatures append LATER — sink-first)
    val surv = graft.ops.Dedup.nearDupAgainstSidecar(batch, textCol, idCol,
      s"$pipelineDir/minhash", shingleK, numHashes, bands,
      nearDupThreshold, appendSurvivors = false)

    // stage 2: per-row quality gate (pure projection — no state)
    val kept = surv
      .filter(graft.ops.TextAnalysis.qualityScore(col(textCol)) >= minQuality)
      .withColumn("__n_toks",
        graft.ops.TextAnalysis.tokenCount(col(textCol)).cast("long"))

    // stage 3: per-source rolling budget AND doc cap. Prior =
    // quality-kept tokens/docs SEEN so far (admitted or not — the
    // batch mixture stage's running-cum rule); within the batch both
    // cums order by id on the SAME window.
    val budgetDir = s"$pipelineDir/budget_state"
    val prior0 =
      if (exists(budgetDir)) spark.read.parquet(budgetDir)
      else kept.select(col(sourceCol)).limit(0)
        .withColumn("seen_tokens", lit(0L))
        .withColumn("seen_docs", lit(0L))
    // pre-doc-cap state dirs lack seen_docs; treat as zero
    val prior =
      if (prior0.columns.contains("seen_docs")) prior0
      else prior0.withColumn("seen_docs", lit(0L))
    val wSrc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol)).orderBy(col(idCol))
    val cumFrame = wSrc.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val withCum = kept
      .withColumn("__cum", sum(col("__n_toks")).over(cumFrame))
      .withColumn("__rn", row_number().over(wSrc).cast("long"))
    val admitted = withCum
      .join(broadcast(prior.withColumnRenamed(sourceCol, "__psrc")
        .withColumnRenamed("seen_tokens", "__prior")
        .withColumnRenamed("seen_docs", "__prior_docs")),
        col(sourceCol) === col("__psrc"), "left_outer")
      .withColumn("__prior", coalesce(col("__prior"), lit(0L)))
      .withColumn("__prior_docs", coalesce(col("__prior_docs"), lit(0L)))
      .filter(col("__prior") + col("__cum") <= tokensPerSource &&
        col("__prior_docs") + col("__rn") <= docsPerSource)
      .drop("__psrc", "__cum", "__rn", "__prior_docs")

    // stage 4: sequence packing continuing from the persisted offset
    val packDir = s"$pipelineDir/pack_state"
    val offset =
      if (exists(packDir))
        spark.read.parquet(packDir).head().getLong(0)
      else 0L
    val packed = graft.ops.Relational.packSequences(
        admitted.select(col(idCol), col(sourceCol), col("__n_toks")),
        order = Seq(col(idCol)), nTokens = col("__n_toks"),
        seqTokens = seqTokens)
      .withColumn("cum_tokens", col("cum_tokens") + lit(offset))
      .withColumn("start_seq", expr(s"(cum_tokens - n_toks) DIV $seqTokens"))
      .withColumn("start_offset", expr(s"(cum_tokens - n_toks) % $seqTokens"))
      .withColumn("end_seq", expr(s"(cum_tokens - 1) DIV $seqTokens"))
      .select(col(idCol), col(sourceCol), col("n_toks"), col("cum_tokens"),
        col("start_seq"), col("start_offset"), col("end_seq"))
      .localCheckpoint(true)
    val batchSeen = kept.groupBy(col(sourceCol))
      .agg(sum(col("__n_toks")).as("__batch_seen"),
        count(lit(1)).as("__batch_docs"))
    val newState = prior
      .join(batchSeen, Seq(sourceCol), "full_outer")
      .select(col(sourceCol),
        (coalesce(col("seen_tokens"), lit(0L)) +
          coalesce(col("__batch_seen"), lit(0L))).as("seen_tokens"),
        (coalesce(col("seen_docs"), lit(0L)) +
          coalesce(col("__batch_docs"), lit(0L))).as("seen_docs"))
      .localCheckpoint(true)
    val admittedTokens = packed.agg(coalesce(sum(col("n_toks")), lit(0L)))
      .head().getLong(0)

    // writes, sink-first (see crash ordering above), under the
    // pipeline-dir lock: the sidecar append's own lock covers only the
    // minhash tables — the budget/pack state files need the same
    // single-writer enforcement (a second concurrent pipeline would
    // silently double-admit budgets and overlap sequence positions)
    graft.sources.Sinks.withDirLock(spark, pipelineDir, "curateBatch") {
      packed.write.mode("append").parquet(s"$pipelineDir/packed")
      failpoint("curateBatch:after-packed-append")
      graft.ops.Dedup.writeMinhashSidecar(surv, textCol, idCol,
        s"$pipelineDir/minhash", shingleK, numHashes, bands)
      failpoint("curateBatch:after-sidecar-append")
      newState.coalesce(1).write.mode("overwrite").parquet(budgetDir)
      import spark.implicits._
      Seq(offset + admittedTokens).toDF("next_offset")
        .coalesce(1).write.mode("overwrite").parquet(packDir)
    }
    ()
  }

  /** Streaming token-count sidecar maintenance — the EXACT-count twin
    * of [[runSketchToSidecar]] and the incremental feed for
    * [[graft.ops.Curation.tokenRarityAgainstSidecar]]: each
    * micro-batch appends its token-frequency partials
    * ([[graft.ops.Curation.writeTokenCountSidecar]]). Long counts are
    * additive, so the merged table equals a from-scratch build over
    * everything ingested regardless of micro-batching (the rarity
    * scores derived from it are batch-identical — EventStreamsSpec
    * proves it). EXACTLY-ONCE (round 17): the stable micro-batch id
    * rides as the append's batch tag, so a checkpoint-recovery replay
    * collapses at every read instead of double-counting — under the
    * same compact-only-after-in-flight-batches-resolved precondition
    * as [[runBigramLmToSidecar]]. */
  def runTokenCountsToSidecar(docs: DataFrame, textCol: String,
                              sidecarDir: String,
                              checkpointDir: String): Unit = {
    val q = docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.Curation.writeTokenCountSidecar(batch, textCol, sidecarDir,
          batchId = Some(s"b$batchId"))
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Streaming probe-trainer-state maintenance — the ML-trainer twin
    * of [[runTokenCountsToSidecar]] and the continuous feed for the
    * q219 lifecycle: each micro-batch scales its features
    * ([[graft.ops.LinearProbe.scaled]]) and appends ONE Gram-moment
    * row ([[graft.ops.LinearProbe.writeGramSidecar]] — ~d² decimals,
    * so sidecar IO is ∝ micro-batches, never data-sized). Gram
    * moments are additive exact decimals over row-disjoint batches,
    * so the weights fitted from the sidecar are BIT-EQUAL to a
    * from-scratch fit over everything ingested, however the stream
    * micro-batched (EventStreamsSpec proves θ equality).
    *
    * Contract: `featureCols` must be PER-ROW-computable signals
    * (ratios, lengths, flags in [0,1] — the LinearProbe convergence
    * contract); corpus-relative signals (percentile calibration,
    * rarity) are not micro-batch-stable — compute those in a batch
    * feature pipeline and stream its OUTPUT (the standing
    * [[graft.ops.LinearProbe.writeGramSidecar]] note). EXACTLY-ONCE
    * (round 17): the stable micro-batch id rides as the moment row's
    * batch tag, so a checkpoint-recovery replay collapses at every
    * summed read — under the same compaction precondition as
    * [[runBigramLmToSidecar]] (machine-checked where a manifest
    * exists — [[graft.ops.CurationPipeline.compactState]]). */
  def runGramToSidecar(rows: DataFrame, featureCols: Seq[String],
                       labelCol: String, sidecarDir: String,
                       checkpointDir: String): Unit = {
    val d = featureCols.size + 1
    val q = rows.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // skip empty micro-batches: an n=0 moment row carries NULL
        // decimal sums, and an all-empty sidecar would then fail
        // parseGramRow's envelope check instead of fitFromSidecar's
        // clearer empty-sidecar guard (ADVICE r14)
        if (!batch.isEmpty) {
          val scaled = graft.ops.LinearProbe.scaled(batch, featureCols,
            org.apache.spark.sql.functions.col(labelCol))
          graft.ops.LinearProbe.writeGramSidecar(scaled, d, sidecarDir,
            batchId = Some(s"b$batchId"))
        }
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Streaming incremental-curation ingest — the six-stage pipeline's
    * shard feed ([[graft.ops.CurationPipeline]]): each micro-batch is
    * one arriving corpus shard flowing through
    * [[graft.ops.CurationPipeline.ingestShard]] — the sidecar-backed
    * forms of dedup / span removal / decontamination plus the Gram
    * trainer-state append — emitting a curated-survivor metadata
    * shard. [[graft.ops.CurationPipeline.finalizePipeline]] can then
    * produce the packed corpus at ANY batch boundary without touching
    * the raw corpus again; under monotone doc_id arrival its output
    * is row-identical to the one-shot q218 over everything ingested
    * (the q221 hash certificate; EventStreamsSpec proves the streamed
    * path). Call [[graft.ops.CurationPipeline.init]] BEFORE the
    * stream starts — the benchmark gram registry must be frozen
    * first (the cross-batch contamination trap its scaladoc names).
    * Rows must carry doc_id, source, text and the upstream feature
    * pipeline's __f0..__f6, __y. EXACTLY-ONCE (round 16): the
    * micro-batch id — stable across checkpoint-recovery replays, the
    * standard foreachBatch idempotence key — is passed through as the
    * ingest's shard id, so a replayed micro-batch is a committed
    * no-op and a crash ANYWHERE inside the ingest converges on
    * replay ([[graft.ops.CurationPipeline.ingestShard]]'s protocol).
    * PRECONDITION (ADVICE r16): the guarantee needs maintenance
    * compaction to run only after in-flight micro-batches are
    * resolved — a [[graft.ops.CurationPipeline.compactState]] between
    * a crashed ingest's partial appends and the recovery replay would
    * merge away the per-batch identity the replay dedups on.
    * [[graft.ops.CurationPipeline.compactState]] enforces exactly
    * that mechanically (it fails loud on any Gram batch id missing
    * from the manifest), so here the precondition is machine-checked,
    * not operator discipline. */
  def runCurationShards(shards: DataFrame,
                        dirs: graft.ops.CurationPipeline.Dirs,
                        holdout: org.apache.spark.sql.Column,
                        checkpointDir: String): Unit = {
    val q = shards.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.CurationPipeline.ingestShard(batch, dirs, holdout,
          shardId = s"b$batchId")
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Streaming ANN-index ingest — continuous
    * [[graft.ops.SeededKMeans.appendToIvfIndexSeeded]]: each
    * micro-batch of new vectors lands in the stored seeded-IVF index
    * under the index lock, assigned to the nearest STORED centroid.
    * Because append assignment is the same pure argmin the fit uses,
    * the index state after any micro-batching equals one full
    * assignment of everything ingested (EventStreamsSpec proves it) —
    * the q182 invariant, continuously. The index must exist before
    * the stream starts (build is a batch op) and must be built TAGGED
    * ([[graft.ops.SeededKMeans.buildIvfIndexSeeded]]'s `batchId`,
    * e.g. `Some("base")`). EXACTLY-ONCE (round 18 — the rollout's
    * other streaming residue): the stable micro-batch id rides as the
    * append's batch tag, so a checkpoint-recovery replay collapses to
    * one row per (batch_id, vec_id) at every probe read and at
    * compaction instead of double-appending — a duplicated vector can
    * no longer occupy two of the k neighbor slots after a crash
    * replay. Compact ([[graft.ops.SeededKMeans
    * .compactIvfVectorsSeeded]]) only after in-flight micro-batches
    * are resolved, the [[runBigramLmToSidecar]] precondition. */
  def runIvfIngestSeeded(vectors: DataFrame, indexDir: String,
                         checkpointDir: String,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): Unit = {
    val q = vectors.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.SeededKMeans.appendToIvfIndexSeeded(
          batch.sparkSession, indexDir, batch, idCol, vecCol,
          batchId = Some(s"b$batchId"))
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Streaming postings-sidecar maintenance — the inverted-index twin
    * of [[runTokenCountsToSidecar]] and the incremental feed for
    * [[graft.ops.Retrieval.bm25TopKFromSidecar]]: each micro-batch
    * appends its postings + doc-length partials
    * ([[graft.ops.Retrieval.writePostingsSidecar]]). Documents arrive
    * WHOLE within one micro-batch by construction (a file-source row
    * is one doc), satisfying the sidecar's doc-disjoint batch
    * contract, so the merged index — and every BM25 ranking read off
    * it — equals a from-scratch build over everything ingested,
    * however the stream micro-batched (EventStreamsSpec proves the
    * two-batch == one-shot ranking equality). EXACTLY-ONCE (round
    * 17): the stable micro-batch id rides as the append's batch tag
    * on BOTH tables, so a checkpoint-recovery replay collapses at
    * every read instead of double-appending (a duplicated doclen row
    * would otherwise fan out every scoring candidate for that doc) —
    * under the same compaction precondition as
    * [[runBigramLmToSidecar]]. */
  def runPostingsToSidecar(docs: DataFrame, sidecarDir: String,
                           checkpointDir: String,
                           idCol: String = "doc_id",
                           textCol: String = "text"): Unit = {
    val q = docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.Retrieval.writePostingsSidecar(batch, sidecarDir,
          idCol, textCol, batchId = Some(s"b$batchId"))
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Streaming bigram-LM sidecar maintenance — the language-model
    * twin of [[runPostingsToSidecar]] and the incremental feed for
    * [[graft.ops.TextAnalysis.lmCrossEntropyFromSidecar]]: each
    * micro-batch appends its (w1, w2, c12) partials
    * ([[graft.ops.TextAnalysis.writeBigramCountSidecar]]). A bigram
    * never spans documents and documents arrive whole within one
    * micro-batch (file-source rows are docs), so summed counts — and
    * the full LM derived from them (c1/n_succ/n_prec/n_types all
    * DERIVE from the summed table) — equal a from-scratch train over
    * everything ingested, however the stream micro-batched
    * (EventStreamsSpec proves scoring equality). EXACTLY-ONCE (round
    * 16): the stable micro-batch id rides as the append's batch tag,
    * so a checkpoint-recovery replay of a micro-batch collapses at
    * every read instead of double-counting — the
    * [[runCurationShards]] upgrade applied to the LM family.
    * PRECONDITION (ADVICE r16): tag-dedup evidence lives in the
    * sidecar rows, so
    * [[graft.ops.TextAnalysis.compactBigramSidecar]] must run
    * only after in-flight micro-batches are resolved (stream stopped
    * at a checkpoint boundary, or the batch's checkpoint commit
    * confirmed) — compacting between a landed append and its
    * checkpoint commit merges the tag into the `__compacted__`
    * sentinel and the recovery replay double-counts. Unlike
    * [[runCurationShards]] (whose manifest lets
    * [[graft.ops.CurationPipeline.compactState]] check this
    * mechanically), here the precondition is the operator's
    * compact-cadence discipline. */
  def runBigramLmToSidecar(docs: DataFrame, textCol: String,
                           sidecarDir: String,
                           checkpointDir: String): Unit = {
    val q = docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.TextAnalysis.writeBigramCountSidecar(batch, textCol,
          sidecarDir, batchId = Some(s"b$batchId"))
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Streaming probe-trainer maintenance — the continuously-retrained
    * quality classifier: each micro-batch of SCALED feature rows
    * (`__f0..__f{d-1}`, `__y` — [[graft.ops.LinearProbe.scaled]]'s
    * shape, produced by the upstream feature pipeline) appends ONE
    * Gram moment row ([[graft.ops.LinearProbe.writeGramSidecar]]).
    * Additivity of the exact decimal moments makes a fit from the
    * accumulated sidecar BIT-EQUAL to a from-scratch fit over every
    * row ingested (q212's hash proof) — so the serving weights can be
    * refreshed at any micro-batch boundary by
    * [[graft.ops.LinearProbe.fitFromSidecar]] without touching the
    * corpus. EXACTLY-ONCE (round 17): the stable micro-batch id rides
    * as the moment row's batch tag — replays collapse at every summed
    * read, under the [[runBigramLmToSidecar]] compaction
    * precondition. */
  def runGramToSidecar(features: DataFrame, d: Int,
                       sidecarDir: String,
                       checkpointDir: String): Unit = {
    val q = features.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // empty micro-batches append no moment row (ADVICE r14: an
        // n=0 row has NULL sums and poisons an otherwise-empty
        // sidecar with a misleading envelope error)
        if (!batch.isEmpty) {
          graft.ops.LinearProbe.writeGramSidecar(batch, d, sidecarDir,
            batchId = Some(s"b$batchId"))
        }
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Streaming graph-edge sidecar maintenance — the edge-set feed for
    * [[graft.ops.Graph.pageRankFromEdgeSidecar]]: each micro-batch
    * appends its distinct (src, dst) pairs
    * ([[graft.ops.Graph.writeEdgeSidecar]]). The contract here is
    * STRONGER than every other sidecar's: centrality depends only on
    * the edge SET and the reader dedups, so even an at-least-once
    * REPLAY is a no-op — set-union appends are idempotent, not just
    * additive (no double-count caveat at all). */
  def runEdgesToSidecar(edges: DataFrame, srcCol: String, dstCol: String,
                        sidecarDir: String,
                        checkpointDir: String): Unit = {
    val q = edges.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.ops.Graph.writeEdgeSidecar(batch, srcCol, dstCol, sidecarDir)
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Streaming histogram-sidecar maintenance — the exact-count
    * percentile feed ([[graft.ops.Sketches.writeHistSidecar]]): each
    * micro-batch appends its (group, bin, cnt) partials; additive
    * long counts make the merged histogram — and every quantile read
    * off it — identical to a from-scratch build regardless of
    * micro-batching. (lo, hi, bins) must match across all appends of
    * one sidecar (the band-key parameter contract). EXACTLY-ONCE
    * (round 17): the stable micro-batch id rides as the append's
    * batch tag, so a checkpoint-recovery replay collapses at every
    * read instead of double-counting bins — under the same
    * compaction precondition as [[runBigramLmToSidecar]]. */
  def runHistToSidecar(df: DataFrame, groupCols: Seq[String],
                       valueCol: String, sidecarDir: String,
                       checkpointDir: String,
                       lo: Double, hi: Double, bins: Int): Unit = {
    val q = df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.Sketches.writeHistSidecar(batch, groupCols, valueCol,
          sidecarDir, lo, hi, bins, batchId = Some(s"b$batchId"))
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Streaming sketch-sidecar maintenance: each micro-batch appends
    * its per-group HLL sketch rows ([[graft.ops.Sketches
    * .writeSketchSidecar]]) — the continuous form of per-shard sketch
    * stats. Because HLL union is lossless at equal precision, the
    * merged estimates equal a from-scratch batch build over everything
    * ingested, regardless of how the stream happened to micro-batch.
    * EXACTLY-ONCE (round 18 — the rollout's last streaming residue):
    * the sketches were always duplicate-insensitive, but the exact
    * `n_rows` companion double-counted under a checkpoint-recovery
    * replay; the stable micro-batch id now rides as the append's
    * batch tag, so a replayed batch collapses at every read instead —
    * under the same compaction precondition as
    * [[runBigramLmToSidecar]]. Single writer per sidecar, like every
    * appender. */
  def runSketchToSidecar(df: DataFrame, groupCols: Seq[String],
                         valueCol: String, sidecarDir: String,
                         checkpointDir: String,
                         lgConfigK: Int = 12): Unit = {
    val q = df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.Sketches.writeSketchSidecar(batch, groupCols, valueCol,
          sidecarDir, lgConfigK, batchId = Some(s"b$batchId"))
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Run a streaming DataFrame to a named in-memory table and block
    * until all available input is processed (local smoke path). */
  def runToMemory(df: DataFrame, name: String,
                  mode: OutputMode = OutputMode.Append): DataFrame = {
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(name)
  }
}
