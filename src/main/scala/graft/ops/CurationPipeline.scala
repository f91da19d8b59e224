package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The six-stage pre-training curation pipeline (q218) in its two
  * production forms:
  *
  *  - ONE-SHOT: q218 composes the six stages as a single batch plan
  *    over a complete corpus snapshot and calls [[finalizeStages]] for
  *    stages 4–6.
  *  - INCREMENTAL (q221 — how a 100 TB corpus actually runs: shards
  *    arrive over weeks; nobody re-runs the batch pipeline from
  *    scratch): each arriving shard flows through [[ingestShard]] —
  *    the SIDECAR-backed forms of stages 1–3 plus the Gram trainer-
  *    state append — and emits a curated-survivor metadata shard;
  *    [[finalizePipeline]] then runs stages 4–6 over the accumulated
  *    METADATA only (θ from the Gram sidecar, scores + calibration +
  *    mixture + packing over survivor rows). The raw corpus is read
  *    exactly once, at ingest.
  *
  * Why the split is where it is: stages 1–3 are per-shard decisions
  * against monotone state (seen-digest set, seen-chunk-key set, a
  * FROZEN benchmark gram registry) — incremental by construction.
  * Stages 4–6 are corpus-RELATIVE (per-source percentile rank, the
  * temperature budget over total kept tokens, the global packing
  * cumsum): a doc's calibrated percentile depends on shards that have
  * not arrived yet, so no per-shard emission can finalize them. The
  * finalize pass therefore runs over survivor METADATA (id, source,
  * token count, feature longs — tens of bytes/doc vs KBs of text), the
  * standard mix-job shape.
  *
  * EQUIVALENCE CONTRACT (hash-proven by q221 against q218's own
  * oracle at three SFs): when shards partition the corpus in monotone
  * doc_id ranges, ingest-all-shards + finalize is ROW-IDENTICAL to the
  * one-shot q218 over the union —
  *  - stage 1/2 keep-first-arrived == keep-min-id under monotone
  *    arrival ([[Dedup.dedupAgainstSidecar]] /
  *    [[Dedup.removeDuplicateSpansAgainstSidecar]] contracts);
  *  - stage 3 checks a registry frozen BEFORE ingest (a late eval
  *    shard retroactively contaminating already-emitted docs is the
  *    cross-batch ordering trap the frozen registry closes);
  *  - θ from the Gram sidecar is BIT-EQUAL to the one-shot fit by
  *    moment additivity (the q212/q219 invariant);
  *  - stages 4–6 are one deterministic computation over an identical
  *    survivor set with identical scores.
  *
  * Scale shape per shard: sidecar IO ∝ distinct digests/chunk keys
  * (32-byte hashes, never text) + ONE d²-decimal Gram row; every
  * membership check is a hashed anti-join AQE can broadcast or
  * bloom-prune; nothing pairs documents. Single-writer per pipeline
  * dir, like every sidecar family. */
object CurationPipeline {

  /** Feature dim (6 signals + intercept) — q209/q210's probe shape. */
  val FeatureDim = 7
  /** Stage-2 chunk stride (q157's test geometry). */
  val ChunkTokens = 10
  /** Stage-3 gram order + drop threshold (q218's documented choice for
    * the ~30-word synthetic vocabulary; production text would run the
    * usual 8-gram / low-threshold pair). */
  val DecontamN = 3
  val DecontamThreshold = 0.5
  /** Stage-4 calibrated cut: keep the top half of every source. */
  val KeepAbovePct = 0.5
  /** Stage-6 packing geometry. */
  val SeqTokens = 512L
  /** Probe GD iterations (q210's training loop). */
  val GdIters = 24

  /** Directory layout of one pipeline run's persistent state. */
  final case class Dirs(base: String) {
    val gram = s"$base/gram"
    val digests = s"$base/digests"
    val chunks = s"$base/chunks"
    val evalGrams = s"$base/evalgrams"
    val shards = s"$base/shards"
  }

  /** Wipe the pipeline state and freeze the benchmark gram registry —
    * runs ONCE, before any shard arrives. */
  def init(spark: SparkSession, dirs: Dirs, evalDocs: DataFrame): Unit = {
    graft.sources.Sinks.wipeForRebuild(spark, dirs.base)
    Curation.writeEvalGramSidecar(evalDocs, DecontamN, dirs.evalGrams)
  }

  /** Ingest one arriving shard: Gram trainer-state append over ALL its
    * feature rows (the probe trains on the raw corpus — the fastText
    * convention q218 documents), then stages 1–3 over the non-holdout
    * rows, emitting the shard's curated-survivor metadata
    * (doc_id, source, kept_toks, __f0..__f6).
    *
    * `shard` must carry doc_id, source, text and the upstream feature
    * pipeline's scaled columns __f0..__f{d-1}, __y
    * ([[LinearProbe.scaled]]'s shape) — corpus-relative feature
    * signals belong UPSTREAM, the standing
    * [[LinearProbe.writeGramSidecar]] contract. `holdout` marks eval
    * rows (excluded from the corpus, per q218's stage 1). */
  def ingestShard(shard: DataFrame, dirs: Dirs, holdout: Column): Unit = {
    val spark = shard.sparkSession
    // empty shards are a no-op: an n=0 Gram row carries NULL decimal
    // sums (the ADVICE-r14 trap), and the stage ops would burn jobs
    // appending empty files; one take(1) probe is cheaper than any of
    // that
    if (shard.isEmpty) return
    LinearProbe.writeGramSidecar(shard, FeatureDim, dirs.gram)
    val fCols = (0 until FeatureDim).map(i => col(s"__f$i"))
    val corpusB = shard.filter(!holdout)
      .select(Seq(col("doc_id"), col("source"), col("text")) ++ fCols: _*)
    // stage 1: incremental normalized exact dedup (digest sidecar)
    val surv1 = Dedup.dedupAgainstSidecar(
        corpusB.withColumn("__ntext", TextAnalysis.normalizeText(col("text"))),
        "__ntext", "doc_id", dirs.digests)
      .drop("__ntext")
    // stage 2: incremental duplicated-span removal (chunk-key sidecar)
    val cleaned = Dedup.removeDuplicateSpansAgainstSidecar(
        surv1.select(col("doc_id"), col("text")), "text", "doc_id",
        dirs.chunks, ChunkTokens)
      .select(col("doc_id"), col("clean_text"),
        (col("n_tokens") - col("removed_tokens")).as("kept_toks"))
      .filter(col("kept_toks") >= 1L)
    // stage 3: decontamination of the CLEAN text vs the frozen registry
    val contam = Curation.decontaminateAgainstGrams(
        cleaned.select(col("doc_id"), col("clean_text").as("text")),
        spark.read.parquet(dirs.evalGrams), DecontamN, DecontamThreshold)
      .select(col("doc_id"), col("contaminated"))
    val shardOut = cleaned.select(col("doc_id"), col("kept_toks"))
      .join(contam, Seq("doc_id"), "left")
      .filter(!coalesce(col("contaminated"), lit(false)))
      .join(surv1.drop("text"), "doc_id")
      .select(Seq(col("doc_id"), col("source"), col("kept_toks")) ++ fCols: _*)
    graft.sources.Sinks.withDirLock(spark, dirs.shards,
      "CurationPipeline.ingestShard") {
      shardOut.write.mode("append").parquet(dirs.shards)
    }
  }

  /** Stages 4–6 — SHARED verbatim by the one-shot (q218) and
    * incremental (q221) forms, so equality of the corpus-relative tail
    * is by construction once the survivor sets and θ agree.
    * `scoredSurvivors`: (doc_id, source, kept_toks, score_fp).
    *
    * Stage 4: per-source percentile calibration, keep the top half.
    * Stage 5: temperature mixture budget in EXACT decimal integer
    * arithmetic (budget_s = ((T div 2)·iw_s) div Σiw — a long product
    * would overflow at real corpus token masses); the only
    * unpartitioned window runs over the per-SOURCE aggregate (rows =
    * source count, bounded by design — the q126 precedent); admission
    * by per-source md5-seeded running sum. Stage 6: 512-token packing
    * through the distributed rank — no single-partition window. */
  def finalizeStages(scoredSurvivors: DataFrame): DataFrame = {
    val kept4 = Curation.percentileNormalize(scoredSurvivors,
      groupCol = "source", valueCol = "score_fp", idCol = "doc_id",
      keepAbove = KeepAbovePct)
    val budgets = kept4.groupBy(col("source"))
      .agg(sum(col("kept_toks")).as("t_src"))
      .withColumn("iw", floor(sqrt(col("t_src").cast("double"))).cast("long"))
      .withColumn("total", sum(col("t_src")).over(Window.partitionBy()))
      .withColumn("sum_iw", sum(col("iw")).over(Window.partitionBy()))
      .withColumn("token_budget",
        expr("cast((cast(total div 2 as decimal(38,0)) * cast(iw as decimal(38,0)))" +
          " div cast(sum_iw as decimal(38,0)) as bigint)"))
      .select(col("source"), col("token_budget"))
    val wSrc = Window.partitionBy(col("source"))
      .orderBy(md5(concat_ws("|", col("doc_id"), lit(42L))), col("doc_id"))
    val kept5 = kept4
      .withColumn("cum_src", sum(col("kept_toks")).over(
        wSrc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(budgets), "source")
      .filter(col("cum_src") <= col("token_budget"))
      .select(col("doc_id"), col("source"), col("score_fp"), col("pct"),
        col("kept_toks"))
    Relational.packSequences(kept5, order = Seq(col("doc_id")),
        nTokens = col("kept_toks"), seqTokens = SeqTokens)
      .select(col("doc_id"), col("source"), col("score_fp"), col("pct"),
        col("n_toks"), col("cum_tokens"), col("start_seq"),
        col("start_offset"), col("end_seq"))
      .orderBy(col("doc_id"))
  }

  /** The incremental run's finalize: θ from the compacted Gram sidecar
    * (bit-equal to the one-shot fit by additivity), score the
    * accumulated survivor metadata, then [[finalizeStages]]. Touches
    * ONLY pipeline state — the corpus is never re-read. */
  def finalizePipeline(spark: SparkSession, dirs: Dirs): DataFrame = {
    LinearProbe.compactGramSidecar(spark, dirs.gram, FeatureDim)
    val theta = LinearProbe.fitFromSidecar(spark, dirs.gram, FeatureDim,
      iters = GdIters)
    val scored = LinearProbe.scoreFp(
        spark.read.parquet(dirs.shards), FeatureDim, theta)
      .select(col("doc_id"), col("source"), col("kept_toks"), col("score_fp"))
    finalizeStages(scored)
  }
}
