package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, in increasing
  * fuzziness:
  *
  *  - exact: hash-groupBy on the text digest — one shuffle on the
  *    digest, keeps the smallest id per group;
  *  - MinHash + LSH banding: shingle → minhash signature → band →
  *    bucket-join → exact-Jaccard verification of candidates;
  *  - SimHash: 64-bit sign-aggregated token hashes, near-dups share
  *    band prefixes (hamming-distance candidates);
  *  - n-gram Jaccard: inverted-index candidate pairs over rare
  *    shingles with a document-frequency cap, then exact Jaccard.
  *
  * All signature computation is per-row Catalyst HOF expressions — no
  * UDFs and no driver involvement, so signatures scale linearly with
  * executors. Pair generation never goes quadratic: candidates come
  * from equality joins on bucket keys (LSH bands or capped shingles),
  * the standard trick that keeps near-dup detection tractable at
  * billions of documents.
  *
  * MLlib offers MinHashLSH/approxSimilarityJoin; the expression-level
  * implementation here stays in whole-stage codegen, avoids the
  * VectorUDT detour, and makes banding explicit.
  */
object Dedup {

  /** Exact dedup (survivor list): one row per distinct text, keeping
    * the minimum id — a single hash aggregate on the digest. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Whitespace-word k-shingles as a distinct array. k=1 → word set. */
  def shingles(text: Column, k: Int): Column = {
    val toks = split(text, " ")
    if (k == 1) array_distinct(toks)
    else array_distinct(
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the minimum over the shingle set of xxhash64(shingle, seed). */
  def minhashSignature(shingleSet: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      seed => array_min(transform(shingleSet, s => xxhash64(s, seed))))

  /** LSH band keys: the signature split into `bands` contiguous chunks,
    * each chunk hashed to one bucket key. Two docs land in the same
    * (band, bucket) iff that chunk of their signatures agrees. */
  def bandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        xxhash64(concat_ws(",", slice(signature, b * rowsPerBand + 1, lit(rowsPerBand))))
          .as("bucket")))

  /** Exact Jaccard similarity of two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** MinHash-LSH near-duplicate pairs:
    * shingle → minhash → band → explode → self-join on (band, bucket)
    * → distinct candidate pair → exact-Jaccard filter.
    *
    * Cost model at scale: signatures are a projection; the join is an
    * equality shuffle on bucket keys whose fan-out is controlled by
    * the band width (wider bands → fewer, higher-precision
    * candidates). The final Jaccard check re-reads only candidate
    * rows' shingle sets. */
  def minhashDedupPairs(df: DataFrame, textCol: String, idCol: String,
                        shingleK: Int = 2, numHashes: Int = 32,
                        bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val withSig = df.select(
      col(idCol).as("id"),
      shingles(col(textCol), shingleK).as("sh"))
      .withColumn("bands", bandKeys(minhashSignature(col("sh"), numHashes), bands, rows))
    val exploded = withSig.select(col("id"), col("sh"), explode(col("bands")).as("bk"))
    val l = exploded.select(col("id").as("id_a"), col("sh").as("sh_a"), col("bk"))
    val r = exploded.select(col("id").as("id_b"), col("sh").as("sh_b"), col("bk"))
    l.join(r, l("bk") === r("bk") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(first(col("jaccard")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash: per token, xxhash64 expands to 64 ±1 bit votes;
    * votes sum across the token multiset; the sign of each bit's total
    * becomes that bit of the fingerprint. Near-identical token
    * multisets → small hamming distance. Entirely per-row HOF math. */
  def simhash64(text: Column): Column = {
    val toks = split(text, " ")
    val votes = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, sequence(lit(0), lit(63)),
          (a, b) => a + when(
            call_function("shiftright", h, b).bitwiseAND(lit(1L)) === 1L,
            lit(1L)).otherwise(lit(-1L)))
      })
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, i) => when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** SimHash band keys: the 64-bit fingerprint cut into 16-bit chunks.
    * Docs within hamming distance 3 share at least one intact chunk
    * (pigeonhole), so joining on chunks finds all such pairs. */
  def simhashBands(sim: Column): Column =
    transform(sequence(lit(0), lit(3)),
      b => struct(b.as("band"),
        call_function("shiftright", sim, b * lit(16))
          .bitwiseAND(lit(0xFFFFL)).as("chunk")))

  /** SimHash near-duplicate pairs via chunk-bucket join + exact
    * hamming-distance filter (bit_count of XOR). */
  def simhashDedupPairs(df: DataFrame, textCol: String, idCol: String,
                        maxHamming: Int = 3): DataFrame = {
    val withSim = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sim"))
      .withColumn("bands", simhashBands(col("sim")))
    val exploded = withSim.select(col("id"), col("sim"), explode(col("bands")).as("bk"))
    val l = exploded.select(col("id").as("id_a"), col("sim").as("sim_a"), col("bk"))
    val r = exploded.select(col("id").as("id_b"), col("sim").as("sim_b"), col("bk"))
    l.join(r, l("bk") === r("bk") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        call_function("bit_count", col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(first(col("hamming")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** n-gram Jaccard pairs via a capped inverted index: explode
    * shingles, drop shingles appearing in more than `dfCap` docs (the
    * stop-shingles that would otherwise make candidate generation
    * quadratic), pair docs sharing a surviving shingle, verify with
    * exact Jaccard. */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        shingleK: Int = 3, threshold: Double = 0.3,
                        dfCap: Int = 50): DataFrame = {
    val withSh = df.select(col(idCol).as("id"),
      shingles(col(textCol), shingleK).as("sh"))
    val inverted = withSh.select(col("id"), explode(col("sh")).as("shingle"))
    val rare = inverted.groupBy(col("shingle"))
      .agg(collect_list(col("id")).as("ids"), count(lit(1)).as("df"))
      .filter(col("df") <= dfCap && col("df") >= 2)
    val pairs = rare
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .distinct()
    val shA = withSh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val shB = withSh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    pairs.join(shA, "id_a").join(shB, "id_b")
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
