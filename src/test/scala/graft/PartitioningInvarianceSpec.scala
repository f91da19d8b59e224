package graft

import graft.queries.{AdvancedQueries, AnalyticsQueries, CoreQueries, CorpusQueries, CurationQueries, ExtendedQueries, RetrievalQueries, ScaleQueries, TemporalQueries}
import org.apache.spark.sql.SparkSession

/** Results must be BYTE-IDENTICAL regardless of parallelism — the
  * property that lets the same query run on local[4] and a
  * 1000-executor cluster and hash-match the same oracle. Exercises the
  * exact-decimal aggregation discipline end-to-end: each query runs in
  * two child sessions with shuffle parallelism 1 vs 24 and the
  * collected outputs are compared row-for-row. */
class PartitioningInvarianceSpec extends SparkSpec {

  private def withParallelism(n: Int): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    // disable AQE partition coalescing so the parallelism actually differs
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s
  }

  private val cases = Seq(
    CoreQueries.q01PricingSummary,   // decimal sums + decimal-derived mean
    CoreQueries.q12MeanFill,         // broadcast mean fill
    AdvancedQueries.q19Sessionize,   // window + gaps-and-islands + decimal
    AdvancedQueries.q46RunningTotal, // running decimal frame
    ExtendedQueries.q60StatsMoments, // variance/corr from exact moments
    ExtendedQueries.q83MinMaxBy,     // argmax with deterministic tiebreak
    CurationQueries.q118MixtureWeights, // exact-long weight denominator
    CurationQueries.q119CurationReport, // composed curation flags
    CurationQueries.q116VocabCoverage,  // distributed global rank + offsets
    ScaleQueries.q120AnnJoinLsh,        // bucket join + rounded-cosine rank
    ScaleQueries.q121DupSpans,          // chunk-hash dup spans
    ScaleQueries.q122AnnJoinExact,      // broadcast batch + group-limit rank
    ScaleQueries.q125SeqPack,           // distributed global token cumsum
    ScaleQueries.q126MixtureApply,      // per-source budget window
    ScaleQueries.q128AsofForward,       // forward as-of union+window
    ScaleQueries.q131CurationPipeline,  // the full composed pipeline
    ScaleQueries.q134SemanticDedup,     // LSH buckets + CC closure
    ScaleQueries.q137MixtureUpsample,   // md5-uniform replication
    ScaleQueries.q138DetShuffle,        // md5-ranked global shuffle
    ScaleQueries.q140QualityBudget,     // quality-ordered token cumsum cut
    ScaleQueries.q142BalanceClasses,    // per-class md5-prefix balancing
    ScaleQueries.q144DiversitySample,   // bucket round-robin TakeOrdered
    ScaleQueries.q145GroupSplit,        // md5-uniform group side decision
    ScaleQueries.q147CdcDupSpans,       // CDC chunk-hash dup spans
    ScaleQueries.q149MinhashPairsMd5,   // md5 banded-LSH pair pipeline
    ScaleQueries.q187NearDupEval,       // LSH-vs-reference audit metrics
    CorpusQueries.q150SourceCap,        // md5-ordered per-source ranks
    CorpusQueries.q151TokenRarity,      // occurrence-compressed tf join
    CorpusQueries.q153NormalizedDedup,  // normalized digest agg
    CorpusQueries.q156CorpusDiff,       // digest full-outer diff
    CorpusQueries.q157RemoveDupSpans,   // keep-first span rewrite
    CorpusQueries.q158KnnJoinPq,        // PQ ADC + rerank (memoized fit)
    CorpusQueries.q160DsirSelect,       // decimal LLR sums + Gumbel top-k
    CorpusQueries.q167RemoveDupSpansByQuality, // quality-argmax survivor window
    CorpusQueries.q168TokenRaritySidecar, // sidecar append+compact+score
    TemporalQueries.q166NtzSemantics,   // NTZ window + epoch outputs
    AnalyticsQueries.q161ExactQuantiles, // rank-selected exact quantiles
    AnalyticsQueries.q164EditDistancePairs, // collapse + expand pair set
    AnalyticsQueries.q170HistSidecarQuantiles, // additive bin counts
    AnalyticsQueries.q171RollingQuantiles, // grid + RANGE trailing sums
    AnalyticsQueries.q172RollingQuantilesByType, // grouped rolling grid
    RetrievalQueries.q177Bm25TopK,      // decimal BM25 sums + rank window
    RetrievalQueries.q178Bm25Decontam,  // decimal max + df-cap pruning
    RetrievalQueries.q180Bm25Prf,       // feedback join + decimal expansion
    RetrievalQueries.q183PhraseSearch,  // positional start-offset agg
    RetrievalQueries.q185HybridRrf,     // integer RRF over two rankings
    RetrievalQueries.q186RankingMetrics, // decimal DCG sums + one-division metrics
    graft.queries.DataQueries.q184SplitLeakage, // capped pairs × md5 split
    graft.queries.GraphQueries.q188CopurchasePagerank, // integer power iteration
    AnalyticsQueries.q189HeavyTerms,    // MG candidates + exact recount
    CorpusQueries.q190Collocations,     // lift IEEE tree + TakeOrdered
    CorpusQueries.q191NoveltyCurve,     // md5 rank + first-seen slices
    graft.queries.DataQueries.q192PrefixJaccard, // collapse + prefix join + integer threshold
    graft.queries.DataQueries.q193HardNegatives, // rounded-cosine ranks + margins
    CorpusQueries.q194BigramCoherence,  // integer adjacency counts + one division
    CorpusQueries.q195BigramLm,         // fixed IEEE tree of exact counts
    CorpusQueries.q196LmCrossEntropy,   // decimal Σ k·logp + one division
    CorpusQueries.q199TfidfKeywords,    // long×decimal scores + rank window
    graft.queries.GraphQueries.q197PersonalizedPagerank, // seeded integer power iteration
    graft.queries.GraphQueries.q198SeedDistance, // iterative min-relaxation BFS
    CurationQueries.q200PercentileNorm, // rank/count division with id tiebreak
    CurationQueries.q209QualityFeatures, // composed wide feature join
    CurationQueries.q210QualityProbe,   // exact Gram + integer GD + scoring
    CurationQueries.q211ProbeAuc,       // offset-lifted ranks + exact U
    CurationQueries.q213ProbeCv,        // grouped Gram + fold-keyed GD + AUC
    CurationQueries.q215ProbeQualityCut, // probe scores + offset-lifted budget cut
    CurationQueries.q217ProbeCalibratedCut, // per-source percentile of probe scores
    CurationQueries.q218CurationPipeline, // six-stage composed pipeline
    CurationQueries.q220ProbeWeightDrift, // two exact Gram fits + driver rows
    graft.queries.GraphQueries.q214KCore, // bounded integer peel + core degrees
    graft.queries.GraphQueries.q216KCoreConverged, // fixpoint peel, asserted
    AnalyticsQueries.q201OlsDrift,      // exact decimal moments + IEEE trees
    graft.queries.DataQueries.q202AudioFrames, // integer-only PCM frame features
    graft.queries.DataQueries.q203ContainmentPairs, // collapse + probe-prefix join
    graft.queries.GraphQueries.q205TriangleCounts, // (deg,id)-oriented wedge join
    CorpusQueries.q207SkipgramPmi,      // windowed pairs + PMI IEEE tree
    graft.queries.DataQueries.q208ImageNearDups, // dHash bands + exact popcount
    CorpusQueries.q224UnicodeNormalize, // NFKC fold/survive projections
    // file-state-dependent: each run wipes + reseeds its sidecar, so
    // the survivor set must be a pure function of the data
    ScaleQueries.q123IncrementalDedup,  // digest anti-join + min-id window
    CurationQueries.q212ProbeSidecar,   // additive Gram moment appends
    CurationQueries.q219ProbeLifecycle, // partial-fit + append + drift scores
    CorpusQueries.q204LmSidecar,        // additive bigram counts + LM scoring
    graft.queries.GraphQueries.q206PagerankSidecar, // idempotent edge-set appends
    RetrievalQueries.q179Bm25Sidecar,   // postings append+compact+rank
    ScaleQueries.q136NearDupSidecar,    // band join + signature estimator
    ScaleQueries.q143StreamingCuration, // curation body + state plumbing
    // round 16: the crash-replay ingest protocol (manifest check,
    // own-tag-excluded membership reads, sink-first partition write,
    // tagged appends, dedupe-by-batch Gram reads) must itself be
    // parallelism-independent — shard decisions are md5/id-keyed joins
    // and windows, never order-of-arrival within a shard
    CurationQueries.q221IncrementalCuration, // three-shard tagged ingest + finalize
    CurationQueries.q222BoundaryFinalize, // mid-stream finalize, twice
    // round 17: the multilingual pipeline + unicode-tokenized
    // retrieval/text-analysis (NFKC fold and per-character CJK
    // tokenization are per-row projections, but the composed
    // decisions downstream must stay md5/id-keyed, never
    // order-of-arrival)
    CurationQueries.q225UnicodeCuration,
    RetrievalQueries.q226UnicodePostings,
    RetrievalQueries.q227Bm25Unicode,
    RetrievalQueries.q228TfidfUnicode,
    // round 17: fixture-served ANN — rounded argmin/probe/ADC rules
    // with deterministic ties must be partition-layout-independent
    // (q158's fixture path rides its standing entry above)
    ScaleQueries.q124AnnJoinIvf,
    ScaleQueries.q130AnnJoinIvfStored,
    CorpusQueries.q159KnnJoinIvfPqStored)

  cases.foreach { q =>
    test(s"${q.name}: identical output at shuffle parallelism 1 vs 24") {
      val lo = q.fn(withParallelism(1), sf0001).collect().map(_.toString).toSeq
      val hi = q.fn(withParallelism(24), sf0001).collect().map(_.toString).toSeq
      assert(lo == hi)
    }
  }

  test("SeededKMeans.fit: identical centroids at shuffle parallelism 1 vs 24") {
    // q173-q176 memoize the fit per JVM (cacheKey), which would make
    // the second run a cache hit — exercise the UNcached fit in both
    // sessions (the Bpe.train pattern below)
    def cents(n: Int) = {
      val s = withParallelism(n)
      graft.ops.SeededKMeans.fit(
        s.read.parquet(s"$sf0001/embeddings.parquet"),
        "vec_id", "embedding", k = 8, iters = 3, seed = 42L)
        .centroids.map(_.toSeq).toSeq
    }
    assert(cents(1) === cents(24))
  }

  test("Bpe.train: identical merge table at shuffle parallelism 1 vs 24") {
    // q154 itself memoizes (trainCached), which would make the second
    // run a cache hit — exercise the UNcached fit in both sessions
    def merges(n: Int) = {
      val s = withParallelism(n)
      graft.ops.Bpe.train(
        s.read.parquet(s"$sf0001/documents.parquet"), "text", numMerges = 8)
    }
    assert(merges(1) === merges(24))
  }
}
