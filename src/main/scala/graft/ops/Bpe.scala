package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich et al. 2016,
  * arXiv:1508.07909) — learn the merge table a subword tokenizer
  * ships, from the corpus the engine curates. The classic algorithm
  * is a driver-bound loop over raw text; the scalable formulation
  * (the fastBPE / subword-nmt trick) aggregates the corpus to a
  * (distinct word, count) table FIRST and runs every merge iteration
  * against that table, weighting pair counts by word frequency:
  *
  *  - the 100 TB corpus is scanned exactly ONCE (the word-count
  *    aggregation — one shuffle, map-side partials);
  *  - each of the `numMerges` iterations is one job over the
  *    |vocab|-sized table: adjacent-pair counts (flatMap + sum agg)
  *    and a TakeOrdered(1) argmax — a bounded one-row collect, the
  *    same class as the IVF centroid collect;
  *  - the driver holds `numMerges` merge rows and nothing else.
  *
  * Symbol re-segmentation after each merge is inherently sequential
  * per word (a greedy left-to-right scan), so it runs as a typed
  * Dataset map over the word table — the engine's sanctioned route
  * for genuine per-row imperative logic (SURVEY §8.2 q86 precedent).
  * It never touches the corpus, only the vocabulary. Each iteration
  * localCheckpoints the segmentation so plan depth stays O(1) and
  * iteration k never re-runs maps 1..k-1.
  *
  * Determinism: the argmax tiebreak is (count desc, left, right) —
  * the merge table is a pure function of the corpus, reproducible at
  * any parallelism (counts are exact longs; no sampling).
  *
  * No end-of-word marker is used (merges may cross into any position;
  * a caller wanting word-boundary-aware merges appends a sentinel
  * token to each word before training — the algorithm is unchanged).
  */
object Bpe {

  /** One learned merge: at `rank` (1-based), adjacent symbol pair
    * (`left`, `right`) — occurring `pairCount` times, frequency-
    * weighted — fuses into `left + right`. */
  final case class Merge(rank: Int, left: String, right: String,
                         pairCount: Long)

  /** Greedy left-to-right single-merge pass (the BPE primitive): each
    * non-overlapping (left, right) occurrence fuses; a fused symbol
    * is not re-examined in the same pass ("aaa" + (a,a) → ["aa","a"]). */
  def applyMerge(syms: IndexedSeq[String], left: String,
                 right: String): IndexedSeq[String] = {
    if (syms.length < 2) return syms
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == left && syms(i + 1) == right) {
        out += left + right; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toIndexedSeq
  }

  /** Segment one word with a trained merge table: character symbols,
    * then each merge applied in rank order. Re-derives exactly the
    * training-time segmentation (BpeSpec asserts the consistency). */
  def encodeWord(word: String, merges: Seq[Merge]): IndexedSeq[String] =
    merges.foldLeft(word.map(_.toString): IndexedSeq[String]) {
      (syms, m) => applyMerge(syms, m.left, m.right)
    }

  /** Train a BPE merge table over the corpus' whitespace words.
    *
    * @param minPairCount stop early when the best remaining pair's
    *   frequency-weighted count falls below this (rare-pair merges
    *   memorize noise; 2 is the subword-nmt default floor) */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            minPairCount: Long = 2L): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    // the ONE corpus pass: (distinct word, count)
    var words: Dataset[(Seq[String], Long)] = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .as[(String, Long)]
      .map { case (w, c) => (w.map(_.toString): Seq[String], c) }
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    var rank = 1
    while (rank <= numMerges && !done) {
      // frequency-weighted adjacent-pair counts over the vocab table
      val best = words
        .flatMap { case (syms, c) =>
          if (syms.length < 2) Iterator.empty
          else syms.iterator.zip(syms.iterator.drop(1)).map(p => (p._1, p._2, c))
        }
        .toDF("l", "r", "c")
        .groupBy(col("l"), col("r")).agg(sum(col("c")).as("s"))
        .orderBy(col("s").desc, col("l"), col("r"))
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      best.headOption match {
        case Some((l, r, s)) if s >= minPairCount =>
          merges += Merge(rank, l, r, s)
          words = words
            .map { case (syms, c) =>
              (applyMerge(syms.toIndexedSeq, l, r): Seq[String], c) }
            .localCheckpoint()
          rank += 1
        case _ => done = true
      }
    }
    merges.toSeq
  }

  private val trainCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Merge]]()

  /** Memoized [[train]] — one fit per JVM per (corpus key, params),
    * the [[graft.ml.LoanPipeline.trainCached]] precedent (SURVEY §2.1
    * S7): a merge table is a training ARTIFACT consumed by many
    * downstream queries (q154 publishes it, q155 counts tokens under
    * it), and refitting per consumer would re-run the whole iterative
    * loop for a byte-identical result ([[train]] is deterministic).
    * `corpusKey` must identify the corpus (the sf dir path here);
    * params are folded into the key. */
  def trainCached(docs: DataFrame, corpusKey: String, textCol: String,
                  numMerges: Int, minPairCount: Long = 2L): Seq[Merge] =
    trainCache.computeIfAbsent(
      s"$corpusKey|$textCol|$numMerges|$minPairCount",
      _ => train(docs, textCol, numMerges, minPairCount))

  /** The merge table as a DataFrame (rank, left, right, pair_count) —
    * the artifact a tokenizer build persists. */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right, m.pairCount))
      .toDF("rank", "left", "right", "pair_count")
  }

  /** Per-document BPE token counts under a trained merge table — the
    * real-tokenizer upgrade of [[TextAnalysis.bpeishTokenCount]]'s
    * regex estimate, and the number every token-budget operator
    * (q118/q125/q126/q140) consumes.
    *
    * Scale shape: the corpus is never run through the imperative
    * encoder — each DISTINCT word is encoded once (typed map over the
    * |vocab| table), and per-doc counts come from joining the doc's
    * (word, count) pairs — the same occurrence-compression as
    * [[Curation.tokenRarity]] — against that word table on the token
    * key, then one per-doc rollup. Three shuffles total, none of them
    * carrying token occurrences or symbol arrays. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val perDoc = docs.select(col(idCol),
        explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("c"))
    val encoded = perDoc.select(col("w")).distinct()
      .as[String]
      .map(w => (w, encodeWord(w, merges).length.toLong))
      .toDF("w", "n_bpe")
    perDoc.join(encoded, Seq("w"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_words"),
        sum(col("c") * col("n_bpe")).as("n_bpe_tokens"))
  }
}
