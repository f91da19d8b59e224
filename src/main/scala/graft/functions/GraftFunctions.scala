package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}

/** The engine's custom function surface.
  *
  * Three access paths, all backed by the same Catalyst expressions:
  *  - Scala `Column` API: [[cosine_sim]];
  *  - SQL, per session: [[register]];
  *  - SQL, at session build time:
  *    `.withExtensions(new GraftExtensions)` (the
  *    SparkSessionExtensions route for cluster-wide deployment).
  */
object GraftFunctions {

  /** Codegen'd cosine similarity (see [[CosineSimilarity]]). */
  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSimilarity(ColumnBridge.expression(a),
        ColumnBridge.expression(b)))

  /** Codegen'd squared euclidean distance (see [[SqEuclideanDistance]]). */
  def sq_euclidean(a: Column, b: Column): Column =
    ColumnBridge.column(
      SqEuclideanDistance(ColumnBridge.expression(a),
        ColumnBridge.expression(b)))

  /** Codegen'd minhash signature (see [[MinHashSignature]]). */
  def minhash_signature(hashedShingles: Column, numHashes: Int): Column =
    ColumnBridge.column(
      MinHashSignature(ColumnBridge.expression(hashedShingles), numHashes))

  /** Fused zero-copy hashed word-k-gram shingler (see [[HashedShingles]]). */
  def hashed_shingles(text: Column, k: Int): Column =
    ColumnBridge.column(HashedShingles(ColumnBridge.expression(text), k))

  /** Bounded single-pass uniform sample aggregate (see [[ReservoirSample]]). */
  def reservoir_sample(c: Column, k: Int, seed: Long = 42L): Column =
    ColumnBridge.column(
      ReservoirSample(ColumnBridge.expression(c), k, seed).toAggregateExpression())

  /** Bounded-state heavy-hitter candidate aggregate (see
    * [[MisraGriesCandidates]]). */
  def mg_candidates(c: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesCandidates(ColumnBridge.expression(c), k).toAggregateExpression())

  /** Fused zero-copy marker-word counter (see [[TokensInSet]]). */
  def tokens_in_set(text: Column, words: Seq[String]): Column =
    ColumnBridge.column(TokensInSet(ColumnBridge.expression(text), words))

  /** Fused one-scan word-repetition statistics (see [[WordRepStats]]). */
  def word_rep_stats(text: Column): Column =
    ColumnBridge.column(WordRepStats(ColumnBridge.expression(text)))

  /** Unicode-aware canonical normalization (see [[NfkcNormalize]]). */
  def nfkc_normalize(text: Column): Column =
    ColumnBridge.column(NfkcNormalize(ColumnBridge.expression(text)))

  /** Fused character-n-gram counter (see [[NgramsInSet]]). */
  def ngrams_in_set(text: Column, grams: Seq[String]): Column =
    ColumnBridge.column(NgramsInSet(ColumnBridge.expression(text), grams))

  /** Sorted-merge intersection size (see [[SortedIntersectCount]]). */
  def sorted_intersect_count(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedIntersectCount(ColumnBridge.expression(a),
        ColumnBridge.expression(b)))

  /** Fused positional signature agreement (see [[SignatureAgreement]]). */
  def signature_agreement(a: Column, b: Column): Column =
    ColumnBridge.column(
      SignatureAgreement(ColumnBridge.expression(a),
        ColumnBridge.expression(b)))

  /** Fused one-scan 64-bit SimHash (see [[SimHash64]]). */
  def simhash64(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text)))

  /** Cross-engine-replayable 60-bit SimHash (see [[SimHash64Md5]]). */
  def simhash64_md5(text: Column): Column =
    ColumnBridge.column(SimHash64Md5(ColumnBridge.expression(text)))

  /** Fused CDC boundary scan (see [[CdcChunkStarts]]). */
  def cdc_chunk_starts(text: Column, targetTokens: Int): Column =
    ColumnBridge.column(
      CdcChunkStarts(ColumnBridge.expression(text), targetTokens))

  /** Cross-engine-replayable md5 minhash signature from text
    * (see [[MinHashMd5Signature]]). */
  def minhash_md5_signature(text: Column, shingleK: Int,
                            numHashes: Int): Column =
    ColumnBridge.column(
      MinHashMd5Signature(ColumnBridge.expression(text), shingleK, numHashes))

  /** Fused hyperplane-LSH bucket id (see [[HyperplaneBucket]]). */
  def hyperplane_bucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    ColumnBridge.column(HyperplaneBucket(ColumnBridge.expression(vec),
      planes.map(_.toArray).toArray))

  /** Fused one-scan rolling fingerprint (see [[RollingFingerprint]]). */
  def rolling_fingerprint(text: Column): Column =
    ColumnBridge.column(RollingFingerprint(ColumnBridge.expression(text)))

  /** Cross-engine-replayable md5 rolling fingerprint
    * (see [[RollingFingerprintMd5]]). */
  def rolling_fingerprint_md5(text: Column): Column =
    ColumnBridge.column(RollingFingerprintMd5(ColumnBridge.expression(text)))

  /** Bloom membership probe (see [[BloomMightContain]]); `bloom` rides
    * the expression as serialized bytes. */
  def bloom_might_contain(c: Column,
      bloom: org.apache.spark.util.sketch.BloomFilter): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(c),
      BloomMightContain.serialize(bloom)))

  /** Fused PQ code assignment (see [[PqEncode]]); the codebook rides
    * the expression as a literal reference object. `roundTo ≥ 0` is
    * the committed-codebook serving mode (rounded subspace distances
    * — SQL-replayable argmin). */
  def pq_encode(vec: Column, codebooks: Array[Array[Array[Double]]],
                normalize: Boolean = false, roundTo: Int = -1): Column =
    ColumnBridge.column(
      PqEncode(ColumnBridge.expression(vec), codebooks, normalize, roundTo))

  /** Per-query PQ ADC lookup table (see [[PqLut]]). */
  def pq_lut(vec: Column, codebooks: Array[Array[Array[Double]]],
             normalize: Boolean = false, roundTo: Int = -1): Column =
    ColumnBridge.column(
      PqLut(ColumnBridge.expression(vec), codebooks, normalize, roundTo))

  /** Asymmetric PQ distance from codes + LUT (see [[PqAdcDistance]]). */
  def pq_adc(codes: Column, lut: Column, ksub: Int): Column =
    ColumnBridge.column(PqAdcDistance(ColumnBridge.expression(codes),
      ColumnBridge.expression(lut), ksub))

  /** Micro-grid (all-long) seeded-KMeans family (see
    * [[ArgminCellLong]] / [[PqEncodeLong]] / [[PqAdcLong]] /
    * [[SqEuclideanLong]]); constant tables ride the expressions as
    * literal reference objects, so — like [[pq_encode]] — these are
    * Column-API only, not SQL-registrable. */
  def argmin_cell_long(vec: Column, cents: Array[Array[Long]]): Column =
    ColumnBridge.column(ArgminCellLong(ColumnBridge.expression(vec), cents))

  def pq_encode_long(vec: Column,
                     codebooks: Array[Array[Array[Long]]]): Column =
    ColumnBridge.column(PqEncodeLong(ColumnBridge.expression(vec), codebooks))

  def pq_adc_long(vec: Column, codes: Column,
                  codebooks: Array[Array[Array[Long]]]): Column =
    ColumnBridge.column(PqAdcLong(ColumnBridge.expression(vec),
      ColumnBridge.expression(codes), codebooks))

  def sq_euclidean_long(a: Column, b: Column): Column =
    ColumnBridge.column(SqEuclideanLong(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))

  /** Evaluate a foldable int argument of a SQL call (e.g. the `k` in
    * `minhash_signature(sh, 64)`). */
  private def intArg(fn: String, e: Expression): Int = {
    require(e.foldable, s"$fn: expected a literal int argument, got $e")
    e.eval() match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"$fn: expected int literal, got $other")
    }
  }

  /** Every custom function, by SQL name — the single source both
    * registration paths ([[register]] and [[GraftExtensions]]) draw
    * from, so the SQL surface can't drift from the Column API. */
  private[functions] val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (exprs => CosineSimilarity(exprs(0), exprs(1))),
    "sq_euclidean" -> (exprs => SqEuclideanDistance(exprs(0), exprs(1))),
    "sq_euclidean_long" -> (exprs => SqEuclideanLong(exprs(0), exprs(1))),
    "minhash_signature" -> (exprs =>
      MinHashSignature(exprs(0), intArg("minhash_signature", exprs(1)))),
    "hashed_shingles" -> (exprs =>
      HashedShingles(exprs(0), intArg("hashed_shingles", exprs(1)))),
    "reservoir_sample" -> (exprs =>
      ReservoirSample(exprs(0), intArg("reservoir_sample", exprs(1)),
        if (exprs.length > 2) intArg("reservoir_sample", exprs(2)).toLong
        else 42L)),
    "mg_candidates" -> (exprs =>
      MisraGriesCandidates(exprs(0), intArg("mg_candidates", exprs(1)))),
    "tokens_in_set" -> (exprs =>
      TokensInSet(exprs(0), stringArrayArg("tokens_in_set", exprs(1)))),
    "word_rep_stats" -> (exprs => WordRepStats(exprs(0))),
    "nfkc_normalize" -> (exprs => NfkcNormalize(exprs(0))),
    "ngrams_in_set" -> (exprs =>
      NgramsInSet(exprs(0), stringArrayArg("ngrams_in_set", exprs(1)))),
    "sorted_intersect_count" -> (exprs =>
      SortedIntersectCount(exprs(0), exprs(1))),
    "signature_agreement" -> (exprs =>
      SignatureAgreement(exprs(0), exprs(1))),
    "simhash64" -> (exprs => SimHash64(exprs(0))),
    "simhash64_md5" -> (exprs => SimHash64Md5(exprs(0))),
    "cdc_chunk_starts" -> (exprs =>
      CdcChunkStarts(exprs(0), intArg("cdc_chunk_starts", exprs(1)))),
    "minhash_md5_signature" -> (exprs =>
      MinHashMd5Signature(exprs(0), intArg("minhash_md5_signature", exprs(1)),
        intArg("minhash_md5_signature", exprs(2)))),
    "rolling_fingerprint" -> (exprs => RollingFingerprint(exprs(0))),
    "rolling_fingerprint_md5" -> (exprs => RollingFingerprintMd5(exprs(0))))

  /** Evaluate a foldable array-of-strings argument of a SQL call. */
  private def stringArrayArg(fn: String, e: Expression): Seq[String] = {
    require(e.foldable, s"$fn: expected a literal array of strings")
    val arr = e.eval()
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  /** Register all custom functions in an existing session's registry
    * (SQL name resolution). Idempotent. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}

/** Session-extension registration: injects the custom functions, the
  * TopKPerGroup planner strategy, and the row_number→top-k optimizer
  * rewrite (off unless spark.graft.topk.rewrite=true) into every
  * session built with these extensions — the deployment path for a
  * shared cluster (spark.sql.extensions=graft.functions.GraftExtensions). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.functions.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[CosineSimilarity].getPackage.getName, name),
        builder))
    }
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    e.injectOptimizerRule(_ => graft.plans.TopKRewriteRule)
  }
}
