package graft.ops
// (cdcChunk robustness tests appended at the bottom of the suite)

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount counts whitespace tokens") {
    val got = Seq("a b c", "single").toDF("t")
      .select(TextAnalysis.tokenCount($"t")).as[Int].collect().toSeq
    assert(got === Seq(3, 1))
  }

  test("bpeishTokenCount splits runs of letters/digits/punct") {
    val got = Seq("abc123 def!").toDF("t")
      .select(TextAnalysis.bpeishTokenCount($"t")).as[Int].collect()(0)
    // abc, 123, def, !
    assert(got === 4)
  }

  test("langId picks the profile with most marker hits, und on no hits") {
    val got = Seq(
      "the cat is on the mat and a dog",
      "el gato y la casa de que en",
      "der hund und die katze ist ein",
      "zzz qqq xxx").toDF("t")
      .select(TextAnalysis.langId($"t")).as[String].collect().toSeq
    assert(got === Seq("en", "es", "de", "und"))
  }

  test("langIdCharNgram: trigram profiles pick the language, und on none") {
    val got = Seq(
      "the weather is changing and interesting",
      "aquellos que hablado los nacion",
      "der schnelle reiche einfache",
      "zz qq xx").toDF("t")
      .select(TextAnalysis.langIdCharNgram($"t")).as[String].collect().toSeq
    assert(got(0) === "en")
    assert(got(1) === "es")
    assert(got(2) === "de")
    assert(got(3) === "und")
  }

  test("qualityColumns ratios are consistent") {
    val row = Seq("the quick fox! a b").toDF("t")
      .select(TextAnalysis.qualityColumns($"t").map { case (n, c) => c.as(n) }: _*)
      .collect()(0)
    assert(row.getAs[Int]("n_chars") === 18)
    assert(row.getAs[Int]("n_tokens") === 5)
    assert(row.getAs[Double]("stop_ratio") === 0.4) // "the","a" of 5
  }

  test("fingerprint is order-sensitive and deterministic") {
    val fps = Seq("a b c", "c b a", "a b c").toDF("t")
      .select(TextAnalysis.fingerprint($"t")).as[Long].collect()
    assert(fps(0) === fps(2))
    assert(fps(0) !== fps(1))
  }

  test("chunk: windows, stride, and tail behavior") {
    // 10 tokens, chunk=4, overlap=2 → starts 1,3,5,7 (last start 7 = n-chunk+1)
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val got = TextAnalysis.chunk(Seq((1L, text)).toDF("doc_id", "text"),
        "text", chunkTokens = 4, overlap = 2, "doc_id")
      .orderBy($"chunk_idx")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.length === 4)
    assert(got(0) === ((0L, 4L, "t1 t2 t3 t4")))
    assert(got(1) === ((1L, 4L, "t3 t4 t5 t6")))
    assert(got(3) === ((3L, 4L, "t7 t8 t9 t10")))
  }

  test("chunk: short doc yields one partial chunk; coverage is complete") {
    val df = Seq((1L, "a b"), (2L, (1 to 7).map("w" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunk(df, "text", chunkTokens = 5, overlap = 1, "doc_id")
    val short = got.filter($"doc_id" === 1).collect()
    assert(short.length === 1 && short(0).getLong(2) === 2L)
    // every token of doc 2 appears in some chunk (stride 4, n=7 → starts 1,5)
    val toks = got.filter($"doc_id" === 2)
      .select(explode(split($"chunk_text", " ")))
      .as[String].collect().toSet
    assert(toks === (1 to 7).map("w" + _).toSet)
  }

  test("cdcChunk: full coverage, content-determined boundaries, expected " +
      "chunk length near the target") {
    // target 5: the synthetic corpus has a 31-token vocabulary, of
    // which 5 are boundary tokens at mod 5 (larger moduli can leave
    // zero boundary tokens in so small a vocabulary)
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val got = TextAnalysis.cdcChunk(docs, "text", 5, "doc_id")
    // full token coverage: chunk_tokens sums to the doc's token count
    val sums = got.groupBy("doc_id").agg(sum($"chunk_tokens").as("s"))
      .join(docs.select($"doc_id",
        size(split($"text", " ")).cast("long").as("n")), "doc_id")
    assert(sums.filter($"s" =!= $"n").count() === 0)
    // chunks reassemble the document exactly (explicit chunk_idx sort —
    // collect_list has no order guarantee)
    val rejoined = got
      .groupBy("doc_id")
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct($"chunk_idx", $"chunk_text"))),
        s => s.getField("chunk_text"))).as("re"))
      .join(docs.select($"doc_id", $"text"), "doc_id")
    assert(rejoined.filter($"re" =!= $"text").count() === 0)
    // chunk length is vocabulary-dependent (a repeated token repeats
    // its boundary decision, and the synthetic docs reuse tokens
    // heavily) — assert multi-chunk splitting happens and lengths stay
    // bounded rather than a tight mean
    val mean = got.agg(avg($"chunk_tokens")).as[Double].head()
    assert(mean > 5 && mean < 200, s"mean chunk length $mean")
    assert(got.groupBy("doc_id").count().filter($"count" > 1).count() > 0,
      "no document ever split")
  }

  test("cdcChunk: one inserted token perturbs ONLY its own chunk; " +
      "fixed-stride chunking rewrites every later chunk") {
    val base = (1 to 200).map(i => s"tok$i").mkString(" ")
    val mutated = ((1 to 100).map(i => s"tok$i") ++ Seq("INSERTED") ++
      (101 to 200).map(i => s"tok$i")).mkString(" ")
    val df = Seq((1L, base), (2L, mutated)).toDF("doc_id", "text")

    def chunkSet(chunks: org.apache.spark.sql.DataFrame, id: Long) =
      chunks.filter($"doc_id" === id).select("chunk_text")
        .as[String].collect().toSeq.groupBy(identity).view.mapValues(_.size)
        .toMap

    val cdc = TextAnalysis.cdcChunk(df, "text", 10, "doc_id")
    val (c1, c2) = (chunkSet(cdc, 1L), chunkSet(cdc, 2L))
    def diff(a: Map[String, Int], b: Map[String, Int]) =
      (a.keySet ++ b.keySet).count(k => a.getOrElse(k, 0) != b.getOrElse(k, 0))
    // CDC: at most the chunk containing the insertion differs (it may
    // split in two if INSERTED is itself a cut point) — ≤ 3 chunk texts
    assert(diff(c1, c2) <= 3, s"CDC perturbed ${diff(c1, c2)} chunk texts")

    val fixed = TextAnalysis.chunk(df, "text", 10, 0, "doc_id")
    val (f1, f2) = (chunkSet(fixed, 1L), chunkSet(fixed, 2L))
    // fixed stride: the insertion shifts every later boundary — half
    // the corpus's chunks change
    assert(diff(f1, f2) > 10,
      s"fixed-stride only perturbed ${diff(f1, f2)} chunk texts")
  }

  test("normalizeText collapses case/punctuation/whitespace variants") {
    val variants = Seq(
      "The quick brown fox",
      "THE QUICK BROWN FOX",
      "the, quick... brown! fox?",
      "  the   quick brown fox  ",
      "the-quick-brown-fox").toDF("text")
    val normed = variants.select(TextAnalysis.normalizeText($"text").as("n"))
      .as[String].collect().toSeq
    assert(normed.distinct === Seq("the quick brown fox"))
    // digits survive; genuinely different text stays different
    val other = Seq("the quick brown fox 2").toDF("text")
      .select(TextAnalysis.normalizeText($"text")).as[String].collect()(0)
    assert(other === "the quick brown fox 2")
  }

  test("termStats: tf/df/weight on a hand-checked corpus") {
    val df = Seq((1L, "a a b", "en"), (2L, "a c", "en"), (3L, "x", "fr"))
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.termStats(df)
      .select("lang", "term", "tf", "df", "weight")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got(("en", "a")) === ((3L, 2L, 3.0)))   // tf=3, df=2, 3*2/2
    assert(got(("en", "b")) === ((1L, 1L, 2.0)))   // 1*2/1
    assert(got(("fr", "x")) === ((1L, 1L, 1.0)))   // 1*1/1
  }

  test("collocations: lift ranks the glued pair above frequency-predicted pairs") {
    // "x y" always co-occur (3 of each, 3 pairs); "a b" co-occur at chance
    val docs = Seq("x y a", "x y b", "x y a b", "a c b").toDF("text")
    val got = TextAnalysis.collocations(docs, "text", minCount = 2L, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    val (cAb, cA, cB, lift) = got(("x", "y"))
    assert((cAb, cA, cB) === ((3L, 3L, 3L)))
    // 9 bigrams, 13 tokens; exact IEEE tree: (3/9) / ((3/13)*(3/13))
    assert(lift === (3.0 / 9.0) / ((3.0 / 13.0) * (3.0 / 13.0)))
    // (y,a) occurs twice -> kept; every bigram below minCount is pruned
    assert(got.contains(("y", "a")))
    assert(!got.contains(("y", "b")) && !got.contains(("c", "b")))
  }

  test("collocations: empty and single-token docs contribute no bigrams") {
    val docs = Seq("", "solo", "p q", "p q").toDF("text")
    val got = TextAnalysis.collocations(docs, "text", minCount = 2L, topK = 5)
      .collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSeq === Seq(("p", "q")))
  }

  test("noveltyCurve: dense slices, first-seen attribution, saturating tail") {
    // 4 docs, 4 slices: the md5 order decides which doc introduces
    // each bigram; re-derive the expected curve from the op's own
    // deterministic rank rather than hardcoding hash order
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b x"), (4L, "a b c"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.noveltyCurve(docs, "doc_id", "text", k = 2, slices = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L))
    // 3 distinct bigrams total: "a b", "b c", "b x"
    assert(out.map(_._2).sum === 3L)
    assert(out.last._3 === 3L)
    // cum is the running sum of n_new
    assert(out.scanLeft(0L)((acc, r) => acc + r._2).tail.toSeq === out.map(_._3).toSeq)
    // whichever doc ranks first introduces exactly its 2 bigrams
    assert(out.head._2 === 2L)
  }

  test("bigramCoherence: hand-computed support and conditional ratios; " +
      "sub-2-token docs excluded") {
    val docs = Seq(
      (1L, "a b a b"), (2L, "a b c"), (3L, "c c"), (4L, "solo"))
      .toDF("doc_id", "text")
    // corpus: bigrams (a,b)=3 (b,a)=1 (b,c)=1 (c,c)=1; unigrams a=3 b=3 c=3
    // (doc 4 "solo" adds unigram solo=1 and no pairs)
    val got = TextAnalysis.bigramCoherence(docs, "doc_id", "text", minCount = 2L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq === Seq(
      (1L, 3L, 2L, 2.0 / 3, 7.0 / 9),   // sum_bg 2*3+1*1=7, sum_ug 2*3+1*3=9
      (2L, 2L, 1L, 1.0 / 2, 4.0 / 6),   // sum_bg 3+1, sum_ug 3+3
      (3L, 1L, 0L, 0.0, 1.0 / 3)))      // (c,c) unsupported; 1/c(c)
  }

  test("bigramCoherence: shuffled word-salad scores below the original") {
    // ten copies of a template make its adjacencies well-supported; one
    // doc with the same words in scrambled order keeps every unigram
    // count but loses bigram support
    val template = (1 to 10).map(i => (i.toLong, "the quick brown fox jumps"))
    val salad = Seq((99L, "jumps the brown quick fox"))
    val docs = (template ++ salad).toDF("doc_id", "text")
    val got = TextAnalysis.bigramCoherence(docs, "doc_id", "text", minCount = 3L)
      .collect().map(r => (r.getLong(0), (r.getDouble(3), r.getDouble(4)))).toMap
    val tmpl = got(1L)
    val bad = got(99L)
    assert(tmpl._1 === 1.0 && bad._1 === 0.0, s"support: $tmpl vs $bad")
    assert(bad._2 < tmpl._2, s"cond_ratio must rank salad below template")
  }

  test("bigramLmTable: hand-computed AD-smoothed probabilities") {
    // corpus: "a b a b" and "a c" →
    // bigrams: (a,b)×2, (b,a)×1, (a,c)×1
    // c1(a)=3 n_succ(a)=2; c1(b)=1 n_succ(b)=1
    // n_prec(b)=1, n_prec(a)=1, n_prec(c)=1; n_types=3
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmTable(docs, "text")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6)))).toMap
    assert(got.size === 3)
    // p_ad(b|a) = (2-.75)/3 + (.75·2/3)·(1/3)
    val pAb = (4.0 * 2 - 3) / (4.0 * 3) + (3.0 * 2) / (4.0 * 3) * (1.0 / 3)
    assert(got(("a", "b")) === ((2L, 3L, 2L, 1L, pAb)))
    // p_ad(a|b) = (1-.75)/1 + (.75·1/1)·(1/3)
    val pBa = (4.0 * 1 - 3) / (4.0 * 1) + (3.0 * 1) / (4.0 * 1) * (1.0 / 3)
    assert(got(("b", "a")) === ((1L, 1L, 1L, 1L, pBa)))
  }

  test("bigramLmTable: observed-successor mass stays below 1 per history") {
    // Σ_w2 p_ad(w2|w1) over OBSERVED successors < 1 strictly (the
    // discount reserves continuation mass for unseen successors
    // restricted here to observed w2 types) — a probability-axiom
    // sanity bound a formula typo would break
    val docs = Seq((1L, "a b a b c b a c"), (2L, "b c a"), (3L, "c a b"))
      .toDF("doc_id", "text")
    val sums = TextAnalysis.bigramLmTable(docs, "text")
      .groupBy("w1").agg(sum("p_ad").as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(sums.nonEmpty)
    sums.foreach { case (w1, s) =>
      assert(s > 0.0 && s <= 1.0 + 1e-12, s"mass for '$w1' = $s")
    }
  }

  test("lmCrossEntropy: word salad scores above the fluent template; " +
      "short docs dropped") {
    val template = (1 to 10).map(i => (i.toLong, "the quick brown fox jumps"))
    val salad = Seq((99L, "jumps the brown quick fox"))
    val tiny = Seq((100L, "solo"))
    val docs = (template ++ salad ++ tiny).toDF("doc_id", "text")
    val got = TextAnalysis.lmCrossEntropy(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(!got.contains(100L), "a 1-token doc has no bigram evidence")
    assert(got(1L)._1 === 4L && got(99L)._1 === 4L)
    assert(got(99L)._2 > got(1L)._2,
      s"salad ${got(99L)._2} must exceed template ${got(1L)._2}")
  }

  test("bigram-LM sidecar: incremental appends + compaction score " +
      "BIT-EQUAL to the from-scratch LM") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lm-sidecar").toString
    TextAnalysis.writeBigramCountSidecar(
      docs.filter(col("doc_id") % 2 === 0), "text", dir)
    TextAnalysis.writeBigramCountSidecar(
      docs.filter(col("doc_id") % 2 === 1), "text", dir)
    TextAnalysis.compactBigramSidecar(spark, dir)
    val fromSidecar = TextAnalysis
      .lmCrossEntropyFromSidecar(spark, dir, docs, "doc_id", "text")
      .collect().map(_.toString).sorted
    val fromScratch = TextAnalysis.lmCrossEntropy(docs, "doc_id", "text")
      .collect().map(_.toString).sorted
    assert(fromSidecar.length > 0)
    assert(fromSidecar.toSeq === fromScratch.toSeq)
  }

  test("batch-tagged bigram sidecar: a double-appended batch no longer " +
      "moves the LM, scoring works UNCOMPACTED, and compaction keeps " +
      "the exactly-once collapse") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lm-tagged").toString + "/bg"
    TextAnalysis.writeBigramCountSidecar(
      docs.filter(col("doc_id") % 2 === 0), "text", dir, Some("even"))
    TextAnalysis.writeBigramCountSidecar(
      docs.filter(col("doc_id") % 2 === 1), "text", dir, Some("odd"))
    def score = TextAnalysis
      .lmCrossEntropyFromSidecar(spark, dir, docs, "doc_id", "text")
      .collect().map(_.toString).sorted.toSeq
    // UNCOMPACTED scoring now merges partials at read (pre-round-16
    // this silently required compaction first)
    val clean = score
    assert(clean === TextAnalysis.lmCrossEntropy(docs, "doc_id", "text")
      .collect().map(_.toString).sorted.toSeq)
    // the at-least-once replay that used to double-count
    TextAnalysis.writeBigramCountSidecar(
      docs.filter(col("doc_id") % 2 === 0), "text", dir, Some("even"))
    assert(score === clean)
    TextAnalysis.compactBigramSidecar(spark, dir)
    assert(score === clean)
  }

  test("tfidfKeywords: hand-computed scores, rank cap, term tiebreak") {
    // 3 docs; "common" in all (idf = ln 1 = 0), "rare" only in doc 1
    val docs = Seq(
      (1L, "common rare rare alpha"),
      (2L, "common beta beta"),
      (3L, "common gamma")).toDF("doc_id", "text")
    val rows = TextAnalysis.tfidfKeywords(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(5)) ->
        (r.getString(1), r.getLong(2), r.getLong(3),
          r.getDecimal(4).doubleValue))
      .toMap
    // doc 1: rare tf=2 idf=round(ln 3,6) beats alpha tf=1
    val ln3 = BigDecimal(math.round(math.log(3.0) * 1e6)) / 1e6
    assert(rows((1L, 1)) === (("rare", 2L, 1L, (ln3 * 2).toDouble)))
    assert(rows((1L, 2)) === (("alpha", 1L, 1L, ln3.toDouble)))
    // doc 3: gamma wins; common (idf 0, score 0) ranks second
    assert(rows((3L, 1))._1 === "gamma")
    assert(rows((3L, 2))._1 === "common" && rows((3L, 2))._4 === 0.0)
    // cap: no rnk 3 anywhere even though doc 1 has 3 distinct terms
    assert(!rows.keySet.exists(_._2 > 2))
  }

  test("skipgramPmi: hand-computed counts, weights, PMI, and rank on one doc") {
    val docs = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val got = TextAnalysis.skipgramPmi(docs, "doc_id", "text",
        window = 2, minCount = 1L, k = 5)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDecimal(4).doubleValue, r.getInt(5)))
      .toMap
    // pairs within window 2: (a,b)x2 d=1; (a,a) d=2; (b,a) d=1; (b,b) d=2;
    // (a,c) d=2; (b,c) d=1. T=7, cl(a)=4 cl(b)=3, cr(a)=2 cr(b)=3 cr(c)=2.
    // positive-PMI survivors all share ln(7/6) (14/12 == 7/6):
    val p = BigDecimal(math.round(math.log(7.0 / 6.0) * 1e6)).toDouble / 1e6
    assert(got === Map(
      ("a", "b") -> ((2L, 4L, p, 1)),   // xw = 2 d=1 hits in half-units
      ("b", "a") -> ((1L, 2L, p, 1)),   // pmi tie with (b,c): w2 tiebreak
      ("b", "c") -> ((1L, 2L, p, 2))))
    // negative-PMI pairs (a,a), (b,b), (a,c) are absent
    assert(!got.contains(("a", "a")) && !got.contains(("a", "c")))
  }

  test("skipgramPmi: pairs never cross a document boundary; minCount " +
      "filters reported pairs without changing the marginals") {
    // "x y" | "y x": within-doc pairs only — (x,y) and (y,x), never (y,y)
    val docs = Seq((1L, "x y"), (2L, "y x")).toDF("doc_id", "text")
    val all = TextAnalysis.skipgramPmi(docs, "doc_id", "text",
        window = 2, minCount = 1L, k = 5)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(all === Set(("x", "y"), ("y", "x")))
    // minCount=2 reports nothing (each pair occurs once) — but would
    // have reported them had the marginals shrunk to the filtered set
    // (c=T=cl=cr would give pmi ln(1*2/(1*1)) > 0 only under the
    // UNfiltered marginals; the empty result proves the filter applies
    // at report time, after the probability model is fixed)
    assert(TextAnalysis.skipgramPmi(docs, "doc_id", "text",
      window = 2, minCount = 2L, k = 5).count() === 0L)
  }

  test("normalizeTextUnicode: NFKC folds, any-script survival, mark " +
      "handling — the multilingual fixtures q224's ASCII corpus can't " +
      "carry") {
    def norm(s: String): String =
      Seq(Tuple1(s)).toDF("text")
        .select(TextAnalysis.normalizeTextUnicode($"text"))
        .as[String].collect()(0)
    // fullwidth letters/digits + ideographic space fold to ASCII
    assert(norm("ｈｅｌｌｏ　ｗｏ" +
      "ｒｌｄ０９") === "hello world09")
    // ligature compatibility-decomposes
    assert(norm("ﬁle") === "file")
    // accents (precomposed under NFKC) survive; case folds; punct drops
    assert(norm("Café au LAIT!") === "café au lait")
    // CJK survives the unicode form but the legacy Latin-only form
    // erases it — the exact bug q224 certifies the fix for
    val cjk = "日本語のテキスト"
    assert(norm(cjk) === cjk)
    assert(Seq(Tuple1(cjk)).toDF("text")
      .select(TextAnalysis.normalizeText($"text"))
      .as[String].collect()(0) === "")
    // Cyrillic survives, distinct from any Latin form
    assert(norm("Привет, мир!")
      === "привет мир")
    // case-folding that emits a combining mark must not tear the word:
    // Turkish dotted capital I lowercases to i + U+0307 in ROOT locale
    assert(norm("İstanbul") === "istanbul")
    // pure ASCII input degenerates to normalizeText byte-for-byte
    val ascii = "  The  quick,  brown FOX!  "
    assert(norm(ascii) === Seq(Tuple1(ascii)).toDF("text")
      .select(TextAnalysis.normalizeText($"text")).as[String].collect()(0))
  }

  test("tokensUnicode: CJK ideographs tokenize per character, Latin " +
      "words by whitespace, in one pass") {
    val toks = Seq(Tuple1("我爱spark 日本 hello"))
      .toDF("text")
      .select(TextAnalysis.tokensUnicode($"text").as("t"))
      .as[Seq[String]].collect()(0)
    assert(toks === Seq("我", "爱", "spark", "日", "本",
      "hello"))
  }
}
