package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("train learns the hand-computed merge on a tiny corpus") {
    // words: ab×3, abc×1 → pairs: (a,b)=4, (b,c)=1
    // merge 1: (a,b)→"ab" (count 4); then (ab,c)=1 < minPairCount → stop
    val docs = Seq((1L, "ab ab ab"), (2L, "abc")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 10, minPairCount = 2L)
    assert(merges === Seq(Bpe.Merge(1, "a", "b", 4L)))
  }

  test("train breaks pair-count ties lexicographically") {
    val docs = Seq((1L, "ab ab cd cd")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 2, minPairCount = 2L)
    assert(merges.map(m => (m.left, m.right)) === Seq(("a", "b"), ("c", "d")))
    assert(merges.map(_.pairCount) === Seq(2L, 2L))
  }

  test("applyMerge is greedy left-to-right without re-merging output") {
    // "aaa" + (a,a): first two fuse, the third survives alone
    assert(Bpe.applyMerge(IndexedSeq("a", "a", "a"), "a", "a") ===
      IndexedSeq("aa", "a"))
    // "aaaa": two non-overlapping fusions
    assert(Bpe.applyMerge(IndexedSeq("a", "a", "a", "a"), "a", "a") ===
      IndexedSeq("aa", "aa"))
    // no occurrence → unchanged
    assert(Bpe.applyMerge(IndexedSeq("x", "y"), "a", "b") ===
      IndexedSeq("x", "y"))
  }

  test("encodeWord reassembles every corpus word; segmentation matches " +
      "the training-time states") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val merges = Bpe.train(docs, "text", numMerges = 15)
    assert(merges.size === 15)                   // rich enough corpus
    assert(merges.map(_.rank) === (1 to 15))
    val words = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct().as[String].collect().toSeq
    words.foreach { w =>
      val syms = Bpe.encodeWord(w, merges)
      assert(syms.mkString("") === w, s"reassembly failed for '$w'")
      // every learned symbol the word uses is either a single char or
      // a concatenation produced by some merge
      val vocab = ('a' to 'z').map(_.toString).toSet ++
        ('0' to '9').map(_.toString) ++
        merges.map(m => m.left + m.right)
      syms.foreach(sym => assert(vocab.contains(sym),
        s"'$w' segmented to unknown symbol '$sym'"))
    }
  }

  test("train is deterministic: two runs produce the same table") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val a = Bpe.train(docs, "text", numMerges = 8)
    val b = Bpe.train(docs, "text", numMerges = 8)
    assert(a === b)
  }

  test("tokenCounts matches driver-side encoding of each document") {
    val docs = Seq(
      (1L, "ab ab abc"),
      (2L, "ab xyz"),
      (3L, "q")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 2, minPairCount = 2L)
    val got = Bpe.tokenCounts(docs, "doc_id", "text", merges)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_words", $"n_bpe_tokens")
      .as[(Long, Long, Long)].collect().toSeq
    val expected = Seq((1L, "ab ab abc"), (2L, "ab xyz"), (3L, "q"))
      .map { case (id, text) =>
        val ws = text.split(" ").toSeq
        (id, ws.size.toLong,
          ws.map(w => Bpe.encodeWord(w, merges).length.toLong).sum)
      }
    assert(got === expected)
  }

  test("corpus charset upholds the q154/q155 oracle contract: printable " +
      "ASCII, no '|' delimiter collisions") {
    // The SQL training replay (CorpusQueries.BpeTrainSql) encodes a
    // word's symbols as '|s1||s2||...|' and char-splits by codepoint.
    // Both are sound only while corpus words are pipe-free ASCII
    // (byte = char = UTF-16 unit). Fail here — not as a silent oracle
    // hash divergence — if the testdata generator ever widens charset.
    for (dir <- Seq(sf0001, sf001)) {
      val bad = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("text").rlike("[^\\x20-\\x7e]") || col("text").contains("|"))
        .count()
      assert(bad === 0L, s"non-ASCII or '|' text rows in $dir")
    }
  }

  test("merge table survives the DataFrame round-trip in rank order") {
    val docs = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 3, minPairCount = 2L)
    val df = Bpe.mergesDf(spark, merges).orderBy($"rank")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(df === merges.map(m => (m.rank, m.left, m.right, m.pairCount)))
  }
}
