package graft

import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import org.apache.spark.api.plugin.{DriverPlugin, ExecutorPlugin, SparkPlugin}
import org.apache.spark.sql.SparkSession

/** Task-retry fault injection (round-9 verdict #2 — a new evidence
  * class). Partitioning invariance proves the engine's deterministic
  * operators are layout-independent; nothing before this proved they
  * are RETRY-safe: on a real cluster, tasks are re-executed all the
  * time (executor loss, speculation, fetch-failure resubmission), and
  * a retried task re-running a nondeterministic-ordered stage is
  * exactly the mechanism that corrupts the guarantees this engine
  * sells — md5-ordered deterministic sampling/splits/shuffles,
  * memoized fit artifacts, sidecar appends through the commit
  * protocol.
  *
  * Injection mechanism (public Spark API only): a [[SparkPlugin]]
  * whose executor half throws from `onTaskStart` on the FIRST attempt
  * of every task. `Task.run` invokes plugins inside the task body
  * scope, so the throw is an ordinary task failure — counted against
  * `maxFailures` and retried by the scheduler, exactly like a real
  * executor fault. The session master is `local[cpus, 4]` (local-mode
  * task retries enabled, maxFailures = 4), so attempt 1 of every task
  * runs after attempt 0 died — EVERY task in EVERY stage of every
  * swept query executes under a retry.
  *
  * Evidence shape: one process runs the sweep with injection ARMED,
  * another with it disarmed (separate JVMs so per-JVM memoized
  * artifacts — seeded-KMeans centroids, BPE merge tables — are
  * COMPUTED under injection in the armed run rather than reused from
  * a clean pass). Each prints a sha-256 per query over the sorted
  * result rows; the FAULTS artifact records both sides plus the
  * injected-failure count, and the gate is hash equality with
  * `injected_failures > 0` on the armed side.
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.01), SPARK_GRAFT_FAULT_ARMED
  * (1 = inject, 0 = clean baseline), SPARK_GRAFT_FAULT_QUERIES
  * (comma list or ALL; default = the deterministic-operator set the
  * round-9 verdict names), SPARK_GRAFT_CPUS (default 8).
  */
object FaultInjectionPlugin {
  /** Injection switch — flipped by [[Faults.main]] after session
    * start so session-construction tasks aren't part of the sweep. */
  val armed = new AtomicBoolean(false)

  /** Number of task attempts this plugin killed. */
  val injected = new AtomicLong(0L)
}

class FaultInjectionPlugin extends SparkPlugin {
  override def driverPlugin(): DriverPlugin = null

  override def executorPlugin(): ExecutorPlugin = new ExecutorPlugin {
    override def onTaskStart(): Unit = {
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null && tc.attemptNumber() == 0 &&
          FaultInjectionPlugin.armed.get()) {
        FaultInjectionPlugin.injected.incrementAndGet()
        throw new RuntimeException(
          s"graft-fault-injection: killing first attempt of stage " +
            s"${tc.stageId()} partition ${tc.partitionId()}")
      }
    }
  }
}

object Faults {

  /** The deterministic operators whose guarantees retry could corrupt:
    * md5-ordered shuffle/sample/split family, the packing cumsum, the
    * BPE fit, the seeded-KMeans fit + stored-index lifecycle, and
    * every sidecar appender (exact, bloom, minhash, sketch, token-
    * count, postings, IVF append) — the round-9 verdict's list plus
    * the families it says "and the sidecar appenders" about. */
  private val DefaultQueries = Seq(
    "q11_hash_sample", "q127_stratified_det", "q138_det_shuffle",
    "q145_group_split", "q148_cluster_split", "q150_source_cap",
    "q160_dsir_select", "q125_seq_pack", "q154_bpe_merges",
    "q173_seeded_kmeans", "q175_ivf_stored_seeded",
    "q182_ivf_append_seeded", "q123_incremental_dedup",
    "q133_incremental_dedup_bloom", "q135_sketch_sidecar",
    "q136_neardup_sidecar", "q168_token_rarity_sidecar",
    "q179_bm25_sidecar", "q143_streaming_curation",
    // round-13/14 additions, pinned in code so the default sweep IS
    // the full deterministic-operator set (round-13 verdict #2: a
    // query that lands after the round's sweeps either re-runs the
    // cheap sweeps or waits — keeping the list here makes the sweep
    // registry-synchronized by construction): the k-core peels, the
    // probe-driven cuts, the composed pipeline, the probe lifecycle
    "q214_kcore", "q215_probe_quality_cut", "q216_kcore_converged",
    "q217_probe_calibrated_cut", "q218_curation_pipeline",
    "q219_probe_lifecycle", "q220_probe_weight_drift",
    // round 15: the incremental composed pipeline (four sidecar
    // families written per shard under injection) and its
    // mid-boundary double-finalize twin
    "q221_incremental_curation", "q222_boundary_finalize",
    // round 15: exact probe unlearning (a negated-moment deletion
    // append + compaction under injection)
    "q223_probe_unlearn",
    // round 16: unicode normalization — a stateless projection (retry
    // safety is Spark-native), in the sweep as the first-round
    // measurement convention rather than for a retry-corruptible
    // guarantee
    "q224_unicode_normalize",
    // round 17: the multilingual composed pipeline — four sidecar
    // families written per shard under injection, through the
    // unicode-normalizer parameter — and the unicode-tokenized
    // postings/BM25 path (stateless projections + one deterministic
    // aggregation; in the sweep as the first-round convention)
    "q225_unicode_curation", "q226_unicode_postings",
    "q227_bm25_unicode",
    // round 17: unicode TF-IDF keywords (stateless; first-round
    // convention) and the fixture-served PQ ANN joins — the rounded
    // encode/LUT serving mode plus the localCheckpointed codes/index
    // artifacts under injected first-attempt kills
    "q228_tfidf_unicode", "q158_knn_join_pq",
    "q159_knn_join_ivfpq_stored",
    // round 18: the unicode tokenizer threaded into the pipeline's
    // token-consuming stage families — the CJK six-stage pipeline
    // (four sidecar families per shard, unicode digests), the
    // per-character token-count sidecar lifecycle (tagged appends +
    // compaction under injection), and the unicode LM / quality
    // projections (stateless; in the sweep as the first-round
    // convention)
    "q229_cjk_curation", "q230_unicode_token_sidecar",
    "q231_unicode_lm", "q232_unicode_quality")

  private def hashRows(df: org.apache.spark.sql.DataFrame): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    df.collect().map(_.toString).sorted
      .foreach(s => md.update(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    md.digest().map("%02x".format(_)).mkString
  }

  /** Append-lifecycle scenarios (round-10 verdict #6). The query sweep
    * above already RUNS every sidecar family under injection, but its
    * evidence is the query OUTPUT; a retried WRITE task that
    * double-appended a batch, tore a compaction backup-swap, or
    * re-ran a `foreachBatch` body could leave corrupted ON-DISK state
    * that the particular backing query happens not to read (e.g. an
    * orphan file a later append would compound). Each scenario here
    * runs a full multi-batch sidecar WRITE lifecycle — wipe, ≥2
    * appends split by doc parity, compaction where the family has one
    * — into its own workDir, and the evidence is the resulting
    * on-disk STATE: every table directory read back and hashed over
    * sorted rows (file names/counts are layout, the ROWS are the
    * contract). Armed hash == clean hash ⇒ retried writes neither
    * lose nor duplicate sidecar rows. */
  private val AppendScenarios: Seq[(String,
      (SparkSession, String, String) => Seq[String])] = Seq(
    ("append_postings_sidecar", (s: SparkSession, d: String, w: String) => {
      val docs = graft.sources.Tables.documents(s, d)
      graft.ops.Retrieval.writePostingsSidecar(
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0), w)
      graft.ops.Retrieval.writePostingsSidecar(
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 1), w)
      graft.ops.Retrieval.compactPostingsSidecar(s, w)
      Seq(s"$w/postings", s"$w/doclen")
    }),
    ("append_minhash_sidecar", (s: SparkSession, d: String, w: String) => {
      val docs = graft.sources.Tables.documents(s, d)
      graft.ops.Dedup.writeMinhashSidecar(
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0),
        "text", "doc_id", w)
      graft.ops.Dedup.writeMinhashSidecar(
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 1),
        "text", "doc_id", w)
      graft.ops.Dedup.compactMinhashSidecar(s, w)
      Seq(s"$w/sigs", s"$w/bands", s"$w/stats")
    }),
    ("append_ivf_seeded", (s: SparkSession, d: String, w: String) => {
      val emb = graft.sources.Tables.embeddings(s, d)
      graft.ops.SeededKMeans.buildIvfIndexSeeded(
        emb.filter(org.apache.spark.sql.functions.col("vec_id") % 2 === 0),
        "vec_id", "embedding", w, nlist = 8, iters = 3, seed = 42,
        cacheKey = Some(s"$d/embeddings#faults-even"))
      graft.ops.SeededKMeans.appendToIvfIndexSeeded(s, w,
        emb.filter(org.apache.spark.sql.functions.col("vec_id") % 2 === 1),
        "vec_id", "embedding")
      Seq(s"$w/centroids", s"$w/vectors")
    }),
    ("append_edge_sidecar", (s: SparkSession, d: String, w: String) => {
      // the round-11 graph sidecar's idempotence claim under injected
      // retries: set-union appends make a replayed (here: deliberately
      // double-appended) batch a semantic no-op, and compaction's
      // distinct-collapse must converge to the same edge SET whether
      // or not every write task ran twice
      val Off = 1L << 41
      val c = org.apache.spark.sql.functions.col _
      val pairs = graft.sources.Tables.lineitem(s, d)
        .select("l_orderkey", "l_suppkey")
        .join(graft.sources.Tables.orders(s, d)
          .select("o_orderkey", "o_custkey"),
          c("l_orderkey") === c("o_orderkey"))
        .select(c("l_orderkey").as("ok"),
          c("o_custkey").as("cust"), c("l_suppkey").as("supp"))
      def batch(i: Int) = {
        val p = pairs.filter(c("ok") % 2 === i)
        p.select(c("cust").as("src"), (c("supp") + Off).as("dst"))
          .unionByName(
            p.select((c("supp") + Off).as("src"), c("cust").as("dst")))
      }
      graft.ops.Graph.writeEdgeSidecar(batch(0), "src", "dst", w)
      graft.ops.Graph.writeEdgeSidecar(batch(1), "src", "dst", w)
      graft.ops.Graph.writeEdgeSidecar(batch(0), "src", "dst", w)
      graft.ops.Graph.compactEdgeSidecar(s, w)
      Seq(w)
    }),
    ("append_bigram_sidecar", (s: SparkSession, d: String, w: String) => {
      // the round-11 LM sidecar: additive (w1, w2, c12) counts over
      // doc-disjoint batches; a retried write must neither lose nor
      // double a batch's counts, and compaction's (w1, w2) re-sum must
      // land on the from-scratch totals
      val docs = graft.sources.Tables.documents(s, d)
      graft.ops.TextAnalysis.writeBigramCountSidecar(
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0),
        "text", w)
      graft.ops.TextAnalysis.writeBigramCountSidecar(
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 1),
        "text", w)
      graft.ops.TextAnalysis.compactBigramSidecar(s, w)
      Seq(w)
    }),
    ("append_gram_sidecar", (s: SparkSession, d: String, w: String) => {
      // the round-12 probe trainer state: Gram moment rows are
      // additive exact decimals over row-disjoint feature batches; a
      // retried write must neither lose nor double a batch's moments,
      // and compaction's re-sum must land on the from-scratch Gram
      // (q212 proves the clean path against q210's oracle — this arms
      // the write tasks)
      val scaled = graft.queries.CurationQueries.probeScaled(s, d)
      val c = org.apache.spark.sql.functions.col _
      val pm = org.apache.spark.sql.functions.pmod _
      graft.ops.LinearProbe.writeGramSidecar(
        scaled.filter(pm(c("doc_id"),
          org.apache.spark.sql.functions.lit(2L)) === 0L), 7, w)
      graft.ops.LinearProbe.writeGramSidecar(
        scaled.filter(pm(c("doc_id"),
          org.apache.spark.sql.functions.lit(2L)) === 1L), 7, w)
      graft.ops.LinearProbe.compactGramSidecar(s, w, 7)
      Seq(w)
    }),
    ("delete_gram_sidecar", (s: SparkSession, d: String, w: String) => {
      // the round-15 unlearning lifecycle: ingest two batches, FORGET
      // a sub-batch by negated-moment append, compact. A retried
      // deletion write must neither lose nor double the negation —
      // otherwise the post-compaction state differs from the clean
      // run's (q223 proves the clean path equals from-scratch
      // training on the remaining corpus)
      val scaled = graft.queries.CurationQueries.probeScaled(s, d)
      val c = org.apache.spark.sql.functions.col _
      val pm = org.apache.spark.sql.functions.pmod _
      val l = org.apache.spark.sql.functions.lit _
      graft.ops.LinearProbe.writeGramSidecar(
        scaled.filter(pm(c("doc_id"), l(2L)) === 0L), 7, w)
      graft.ops.LinearProbe.writeGramSidecar(
        scaled.filter(pm(c("doc_id"), l(2L)) === 1L), 7, w)
      graft.ops.LinearProbe.writeGramDeletion(
        scaled.filter(pm(c("doc_id"), l(5L)) === 3L), 7, w)
      graft.ops.LinearProbe.compactGramSidecar(s, w, 7)
      Seq(w)
    }),
    ("append_curation_shards", (s: SparkSession, d: String, w: String) => {
      // the round-15 composed-incremental lifecycle: two shards
      // through CurationPipeline.ingestShard — each shard writes FOUR
      // sidecar families (Gram moments, digest set, chunk-key set,
      // survivor metadata) whose cross-shard state the second shard's
      // keep decisions depend on — then the Gram compaction; the
      // hashed on-disk state is the full pipeline dir
      val c = org.apache.spark.sql.functions.col _
      val docs = graft.sources.Tables.documents(s, d)
      val holdout = c("doc_id") % 19 === 0
      val dirs = graft.ops.CurationPipeline.Dirs(w + "/pipeline")
      graft.ops.CurationPipeline.init(s, dirs, docs.filter(holdout))
      val withFeats = docs.select(c("doc_id"), c("source"), c("text"))
        .join(graft.queries.CurationQueries.probeScaled(s, d), "doc_id")
      val mid = docs.agg(org.apache.spark.sql.functions
        .max(c("doc_id"))).collect()(0).getLong(0) / 2
      graft.ops.CurationPipeline.ingestShard(
        withFeats.filter(c("doc_id") <= mid), dirs, holdout, "s0")
      graft.ops.CurationPipeline.ingestShard(
        withFeats.filter(c("doc_id") > mid), dirs, holdout, "s1")
      graft.ops.CurationPipeline.compactState(s, dirs)
      Seq(dirs.gram, dirs.digests, dirs.chunks, dirs.evalGrams,
        dirs.shards, dirs.manifest)
    }),
    ("replay_curation_shard", (s: SparkSession, d: String, w: String) => {
      // the round-16 crash-replay window (the r15 weak grade): shard
      // s1's ingest CRASHES after the sink + digest append but before
      // the chunk/Gram appends and the manifest commit — simulated by
      // running an exact prefix of the ingest's durable steps — then
      // the natural whole-shard retry replays it, a third shard lands
      // on the replayed state, and the pipeline is compacted and
      // finalized. The hashed on-disk state (all sidecars + manifest +
      // the finalize output) must match the clean run's — under
      // injected task retries on BOTH the crashed prefix and the
      // replay. CurationPipelineSpec proves the crashed-then-replayed
      // state equals the never-crashed run at every crash point; this
      // scenario arms the write tasks of the same window.
      val c = org.apache.spark.sql.functions.col _
      val docs = graft.sources.Tables.documents(s, d)
      val holdout = c("doc_id") % 19 === 0
      val dirs = graft.ops.CurationPipeline.Dirs(w + "/pipeline")
      graft.ops.CurationPipeline.init(s, dirs, docs.filter(holdout))
      val withFeats = docs.select(c("doc_id"), c("source"), c("text"))
        .join(graft.queries.CurationQueries.probeScaled(s, d), "doc_id")
      val third = docs.agg(org.apache.spark.sql.functions
        .max(c("doc_id"))).collect()(0).getLong(0) / 3
      val sh = Seq(
        withFeats.filter(c("doc_id") <= third),
        withFeats.filter(c("doc_id") > third && c("doc_id") <= 2 * third),
        withFeats.filter(c("doc_id") > 2 * third))
      graft.ops.CurationPipeline.ingestShard(sh(0), dirs, holdout, "s0")
      // crashed attempt: sink + digest append only
      graft.ops.CurationPipeline
        .ingestShardSteps(sh(1), dirs, holdout, "s1")
        .take(2).foreach(_._2())
      // the whole-shard retry
      graft.ops.CurationPipeline.ingestShard(sh(1), dirs, holdout, "s1")
      graft.ops.CurationPipeline.ingestShard(sh(2), dirs, holdout, "s2")
      graft.ops.CurationPipeline.compactState(s, dirs)
      graft.ops.CurationPipeline.finalizePipeline(s, dirs)
        .write.mode("overwrite").parquet(w + "/finalized")
      Seq(dirs.gram, dirs.digests, dirs.chunks, dirs.shards,
        dirs.manifest, w + "/finalized")
    }),
    ("retract_curation_shard", (s: SparkSession, d: String, w: String) => {
      // the round-17 tombstone retraction (the r16 weak grade's fix):
      // retract an ingested shard — O(shard): manifest marker +
      // negated Gram row + partition delete, NO digest/chunk rewrite
      // — then RETRY the whole retraction (the crashed-takedown
      // idempotence claim), ingest a later shard whose decide-phase
      // reads must exclude the tombstoned tags, and compactState,
      // where the physical drop of the retracted rows rides the
      // rewrite. The hashed on-disk state (all sidecars + manifest +
      // finalize output) must match the clean run's under injected
      // task retries across the tombstone write, the excluded-tag
      // reads, AND the deferred drop.
      val c = org.apache.spark.sql.functions.col _
      val docs = graft.sources.Tables.documents(s, d)
      val holdout = c("doc_id") % 19 === 0
      val dirs = graft.ops.CurationPipeline.Dirs(w + "/pipeline")
      graft.ops.CurationPipeline.init(s, dirs, docs.filter(holdout))
      val withFeats = docs.select(c("doc_id"), c("source"), c("text"))
        .join(graft.queries.CurationQueries.probeScaled(s, d), "doc_id")
      val third = docs.agg(org.apache.spark.sql.functions
        .max(c("doc_id"))).collect()(0).getLong(0) / 3
      val sh = Seq(
        withFeats.filter(c("doc_id") <= third),
        withFeats.filter(c("doc_id") > third && c("doc_id") <= 2 * third),
        withFeats.filter(c("doc_id") > 2 * third))
      graft.ops.CurationPipeline.ingestShard(sh(0), dirs, holdout, "s0")
      graft.ops.CurationPipeline.ingestShard(sh(1), dirs, holdout, "s1")
      graft.ops.CurationPipeline.retractShard(s, dirs, "s1", sh(1))
      // crashed-retraction retry: must not double-subtract
      graft.ops.CurationPipeline.retractShard(s, dirs, "s1", sh(1))
      graft.ops.CurationPipeline.ingestShard(sh(2), dirs, holdout, "s2")
      graft.ops.CurationPipeline.compactState(s, dirs)
      graft.ops.CurationPipeline.finalizePipeline(s, dirs)
        .write.mode("overwrite").parquet(w + "/finalized")
      Seq(dirs.gram, dirs.digests, dirs.chunks, dirs.shards,
        dirs.manifest, w + "/finalized")
    }),
    ("append_ivf_seeded_tagged", (s: SparkSession, d: String, w: String) => {
      // the round-18 exactly-once ANN ingest (the r17 verdict's #2
      // ask): TAGGED build + tagged append + a DELIBERATE whole-batch
      // replay under the same tag (the checkpoint-recovery shape) +
      // compaction, under injected task retries. The compacted
      // vectors table must hold ONE row per (batch_id, vec_id) —
      // armed hash == clean hash proves retried writes and the
      // replayed batch neither lose nor duplicate index rows (a
      // duplicated vector could occupy two of k neighbor slots).
      val emb = graft.sources.Tables.embeddings(s, d)
      val c = org.apache.spark.sql.functions.col _
      graft.ops.SeededKMeans.buildIvfIndexSeeded(
        emb.filter(c("vec_id") % 2 === 0),
        "vec_id", "embedding", w, nlist = 8, iters = 3, seed = 42,
        cacheKey = Some(s"$d/embeddings#faults-even-tagged"),
        batchId = Some("base"))
      val odd = emb.filter(c("vec_id") % 2 === 1)
      graft.ops.SeededKMeans.appendToIvfIndexSeeded(s, w, odd,
        "vec_id", "embedding", batchId = Some("b1"))
      // the replay: same batch, same tag — must collapse, not double
      graft.ops.SeededKMeans.appendToIvfIndexSeeded(s, w, odd,
        "vec_id", "embedding", batchId = Some("b1"))
      graft.ops.SeededKMeans.compactIvfVectorsSeeded(s, w)
      Seq(s"$w/centroids", s"$w/vectors")
    }),
    ("append_sketch_sidecar", (s: SparkSession, d: String, w: String) => {
      // the round-18 exactly-once sketch sidecar (the r17 verdict's
      // #2 ask, n_rows half): tagged appends + a deliberate
      // whole-batch replay + compaction. The hashed evidence is the
      // MERGED (n_rows, estimate) table, not the raw sidecar rows —
      // serialized HLL bytes may legally order sparse coupons
      // differently across retried partial aggregations while the
      // register STATE (hence every estimate) is identical; the
      // sidecar contract is the merged answer, which must neither
      // lose nor double-count a batch.
      val docs = graft.sources.Tables.documents(s, d)
      val c = org.apache.spark.sql.functions.col _
      val side = s"$w/sketches"
      graft.ops.Sketches.writeSketchSidecar(
        docs.filter(c("doc_id") % 2 === 0), Seq("source"), "text", side,
        batchId = Some("even"))
      val oddHalf = docs.filter(c("doc_id") % 2 === 1)
      graft.ops.Sketches.writeSketchSidecar(
        oddHalf, Seq("source"), "text", side, batchId = Some("odd"))
      // the replay: same batch, same tag — n_rows must not inflate
      graft.ops.Sketches.writeSketchSidecar(
        oddHalf, Seq("source"), "text", side, batchId = Some("odd"))
      graft.ops.Sketches.compactSketchSidecar(s, side, Seq("source"))
      graft.ops.Sketches.mergedDistinct(s, side, Seq("source"))
        .write.mode("overwrite").parquet(s"$w/merged")
      Seq(s"$w/merged")
    }),
    ("append_streaming_curation", (s: SparkSession, d: String, w: String) => {
      // two curateBatch calls = two micro-batches through the SAME
      // pipelineDir: the second batch's dedup/budget/pack state
      // depends on what batch one PERSISTED, so a retry-corrupted
      // first write would also cascade into batch two's rows
      val docs = graft.sources.Tables.documents(s, d)
      Seq(0, 1).foreach { par =>
        graft.streaming.EventStreams.curateBatch(
          docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === par),
          "text", "doc_id", "source", w,
          shingleK = 2, numHashes = 64, bands = 8, nearDupThreshold = 0.7,
          minQuality = 0.5, tokensPerSource = 300L, seqTokens = 256L)
      }
      Seq(s"$w/packed", s"$w/budget_state", s"$w/pack_state",
        s"$w/minhash/sigs", s"$w/minhash/bands", s"$w/minhash/stats")
    }))

  /** One hash per table dir over sorted rows — row-content identity,
    * independent of file layout (part counts/names differ run to run).
    * Only the table name RELATIVE to the scenario's workDir enters the
    * digest: the workDir embeds the armed flag, so hashing absolute
    * paths would make armed and clean runs differ unconditionally. */
  private def hashDirState(spark: SparkSession, workDir: String,
                           dirs: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    dirs.sorted.foreach { dir =>
      val rel = dir.stripPrefix(workDir)
      md.update(rel.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h =
        if (new java.io.File(dir).exists()) hashRows(spark.read.parquet(dir))
        else "ABSENT"
      md.update(h.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    md.digest().map("%02x".format(_)).mkString
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val armed = sys.env.getOrElse("SPARK_GRAFT_FAULT_ARMED", "1") == "1"
    val names = sys.env.get("SPARK_GRAFT_FAULT_QUERIES") match {
      case Some("ALL") => SparkEntry.queries.keys.toSeq.sorted
      case Some(list) => list.split(",").map(_.trim).toSeq
      case None => DefaultQueries
    }
    val spark = GraftSession.withJoinStrategy(SparkSession.builder()
      // local[N, 4]: local-mode task retries, maxFailures = 4 — the
      // injected first-attempt kill leaves 3 more attempts
      .master(s"local[$cpus, 4]")
      .config("spark.plugins", "graft.FaultInjectionPlugin")
      .config("spark.sql.shuffle.partitions", cpus)
      // page granularity ∝ memory-per-task — see GraftSession scaladoc
      .config("spark.buffer.pageSize",
        GraftSession.tungstenPageSize(cores = cpus.toInt).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR") // injected failures are noisy at WARN
    graft.functions.GraftFunctions.register(spark)
    graft.sources.TestdataContract.assertContract(spark, sfDir)

    FaultInjectionPlugin.armed.set(armed)
    val results = names.filter(SparkEntry.queries.contains).map { name =>
      val t0 = System.nanoTime()
      val h =
        try Right(hashRows(SparkEntry.queries(name)(spark, sfDir)))
        catch { case e: Throwable =>
          System.err.println(s"[faults] $name FAILED: ${e.getMessage}")
          Left(e.getClass.getSimpleName)
        }
      (name, h, (System.nanoTime() - t0) / 1e9)
    }

    // append-lifecycle sweep: the WRITE paths under injection, state
    // hashed from disk (see AppendScenarios). Fresh workdir per
    // scenario per armed-state so armed and clean runs never share
    // state; injection stays armed through both the writes AND the
    // state read-back (the read-back retries are part of the claim).
    val appendResults = AppendScenarios.map { case (name, body) =>
      val w = s"target/tmp/faults_${name}_armed$armed"
      val t0 = System.nanoTime()
      val h =
        try {
          graft.sources.Sinks.wipeForRebuild(spark, w)
          val dirs = body(spark, sfDir, w)
          Right(hashDirState(spark, w, dirs))
        } catch { case e: Throwable =>
          System.err.println(s"[faults] $name FAILED: ${e.getMessage}")
          Left(e.getClass.getSimpleName)
        }
      (name, h, (System.nanoTime() - t0) / 1e9)
    }
    FaultInjectionPlugin.armed.set(false)

    def section(rs: Seq[(String, Either[String, String], Double)]): String =
      rs.map {
        case (n, Right(h), t) => f""""$n":{"hash":"$h","sec":$t%.2f}"""
        case (n, Left(e), t) => f""""$n":{"hash":null,"error":"$e","sec":$t%.2f}"""
      }.mkString("{", ",", "}")
    val errors = (results ++ appendResults)
      .collect { case (n, Left(_), _) => "\"" + n + "\"" }
      .mkString("[", ",", "]")
    println(s"""{"metric":"faults","armed":$armed,""" +
      s""""injected_failures":${FaultInjectionPlugin.injected.get()},""" +
      s""""task_max_failures":4,"queries":${section(results)},""" +
      s""""appends":${section(appendResults)},""" +
      s""""errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
  }
}
