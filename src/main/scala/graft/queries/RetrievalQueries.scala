package graft.queries

import graft.QueryDef
import graft.ops.Retrieval
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-9 block: BM25 ranked retrieval ([[graft.ops.Retrieval]]) —
  * the IR layer of the curation surface, fully hash-oracled.
  *
  * The fixed query suite below is the stand-in for an eval/benchmark
  * query set (small by construction — it BROADCASTS, the operator's
  * scale contract). `dup` is the corpus's one rare term (df ≈ 5% of
  * docs), so rankings exercise both signs of the idf: rare-term hits
  * dominate positively while the stopword-class terms (df ≈ 80% of
  * docs, negative idf) demote long common-term docs — the realistic
  * Zipf shape compressed into the synthetic vocabulary.
  */
object RetrievalQueries {

  /** (query_id, query_text) — shared by both queries and both engines. */
  private val QuerySuite: Seq[(Long, String)] = Seq(
    0L -> "dup scan batch",
    1L -> "fast table scan",
    2L -> "hash join merge",
    3L -> "dup vector stream",
    4L -> "customer query data order")

  private def querySuiteDf(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    QuerySuite.toDF("query_id", "query_text")
  }

  private val QuerySuiteValues: String = QuerySuite
    .map { case (id, t) => s"($id, '$t')" }.mkString(", ")

  /** The shared oracle scaffolding: postings / doc lengths / corpus
    * totals / dfs / query terms / per-pair decimal scores — the
    * [[Retrieval.bm25Scores]] pipeline replayed step for step
    * (identical rounded-decimal factor expressions; see the operator
    * scaladoc for why the rounding makes this engine-independent). */
  private def scoredCtes(dfCapRatio: Double): String =
    s"""p AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
       |), post AS (
       |  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
       |  FROM p GROUP BY term, doc_id
       |), dl AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
       |  FROM documents
       |), tot AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(dl) AS BIGINT) AS tot_tokens FROM dl
       |), dfs AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY term
       |), q(query_id, query_text) AS (VALUES $QuerySuiteValues),
       |qt AS (
       |  SELECT DISTINCT query_id, term FROM (
       |    SELECT CAST(query_id AS BIGINT) AS query_id,
       |           unnest(string_split(query_text, ' ')) AS term FROM q)
       |), scored AS (
       |  SELECT qt.query_id, post.doc_id,
       |    CAST(round(ln((2.0 * n_docs - 2.0 * df + 1.0) /
       |                  (2.0 * df + 1.0)), 6) AS DECIMAL(18,6)) *
       |    CAST(round((11.0 * tf * tot_tokens) /
       |               (10.0 * tot_tokens * tf + 3.0 * tot_tokens +
       |                9.0 * dl.dl * n_docs), 6) AS DECIMAL(18,6)) AS w
       |  FROM post
       |  JOIN qt USING (term) JOIN dfs USING (term) JOIN dl USING (doc_id), tot
       |  WHERE CAST(df AS DOUBLE) <= $dfCapRatio * CAST(n_docs AS DOUBLE)
       |), s AS (
       |  SELECT query_id, doc_id, SUM(w) AS score,
       |         CAST(count(*) AS BIGINT) AS n_terms
       |  FROM scored GROUP BY query_id, doc_id
       |)""".stripMargin

  /** Per-query BM25 top-5 over the corpus: the full inverted-index →
    * decimal-scored → ranked pipeline, hash-compared end to end
    * (scores surface as the decimal cast to DOUBLE — exact sums on
    * both sides, so the cast agrees bitwise). */
  val q177Bm25TopK = QueryDef(
    "q177_bm25_topk",
    s"""WITH ${scoredCtes(dfCapRatio = 1.0)},
       |r AS (
       |  SELECT query_id, doc_id, score, n_terms,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id) AS INT) AS rnk
       |  FROM s
       |)
       |SELECT query_id, doc_id, CAST(score AS DOUBLE) AS score, n_terms, rnk
       |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin) { (s, d) =>
    Retrieval.bm25TopK(Tables.documents(s, d), querySuiteDf(s), k = 5)
      .select(col("query_id"), col("doc_id"),
        col("score").cast("double").as("score"), col("n_terms"), col("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Retrieval-based decontamination: corpus docs any suite query
    * retrieves with BM25 ≥ 0.5 (in this corpus: the rare-term docs the
    * `dup` queries profile-match, minus those the common-term negative
    * idf demotes below threshold). `dfCapRatio = 0.8` exercises the
    * stopword-pruning cap on whatever terms cross 80% df at the given
    * SF — the cap comparison is one IEEE product on both sides, so
    * the pruned term set replays exactly. */
  val q178Bm25Decontam = QueryDef(
    "q178_bm25_decontam",
    s"""WITH ${scoredCtes(dfCapRatio = 0.8)}
       |SELECT doc_id, CAST(max(score) AS DOUBLE) AS max_score,
       |       CAST(count(DISTINCT query_id) AS BIGINT) AS n_queries
       |FROM s WHERE score >= CAST(0.5 AS DECIMAL(18,6))
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    Retrieval.bm25Decontaminate(Tables.documents(s, d), querySuiteDf(s),
        minScore = 0.5, dfCapRatio = 0.8)
      .select(col("doc_id"), col("max_score").cast("double").as("max_score"),
        col("n_queries"))
      .orderBy(col("doc_id"))
  }

  /** BM25 top-5 served FROM the incremental postings sidecar
    * ([[Retrieval.writePostingsSidecar]]): the corpus lands in TWO
    * batches (doc_id parity — the q168 sidecar discipline), the
    * sidecar compacts, and ranking runs off the postings tables
    * without re-reading the corpus. Exact long tf/dl rows are
    * additive, so the result is hash-IDENTICAL to q177's one-shot
    * ranking — which is exactly what sharing its oracle proves: the
    * whole incremental path (append → compact → merge → score) must
    * reproduce the from-scratch numbers bit-for-bit. */
  val q179Bm25Sidecar = QueryDef(
    "q179_bm25_sidecar",
    s"""WITH ${scoredCtes(dfCapRatio = 1.0)},
       |r AS (
       |  SELECT query_id, doc_id, score, n_terms,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id) AS INT) AS rnk
       |  FROM s
       |)
       |SELECT query_id, doc_id, CAST(score AS DOUBLE) AS score, n_terms, rnk
       |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin) { (s, d) =>
    val (build, probe) = q179Parts(s, d)
    build()
    probe()
  }

  /** q179 split into BUILD (wipe + two postings appends + compaction —
    * the whole sidecar lifecycle, corpus-linear by design) and SERVE
    * (ranking off the compacted postings) — the q130Parts discipline
    * applied to the postings sidecar (round-9 verdict #6 put q179 in
    * the 100× set; the split certifies that the SERVE side, whose
    * query suite is fixed-size by construction, stays flat while the
    * build absorbs the corpus growth). */
  private[graft] def q179Parts(s: org.apache.spark.sql.SparkSession,
      d: String): (() => Unit, () => org.apache.spark.sql.DataFrame) = {
    val sf = d.replaceAll("[^A-Za-z0-9.]", "_")
    val dir = s"target/tmp/q179_postings_$sf"
    val build = () => {
      val docs = Tables.documents(s, d)
      // fresh sidecar per run (stale postings from an earlier corpus
      // would change rankings — the q168 wipe discipline)
      graft.sources.Sinks.wipeForRebuild(s, dir)
      // tagged appends (round 17): the hash gate now runs the
      // exactly-once path — duplicate-replay collapse at read and
      // compaction — with the oracle unchanged
      graft.ops.Retrieval.writePostingsSidecar(
        docs.filter(col("doc_id") % 2 === 0), dir, batchId = Some("even"))
      graft.ops.Retrieval.writePostingsSidecar(
        docs.filter(col("doc_id") % 2 === 1), dir, batchId = Some("odd"))
      graft.ops.Retrieval.compactPostingsSidecar(s, dir)
    }
    val probe = () =>
      graft.ops.Retrieval.bm25TopKFromSidecar(s, dir, querySuiteDf(s), k = 5)
        .select(col("query_id"), col("doc_id"),
          col("score").cast("double").as("score"), col("n_terms"), col("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    (build, probe)
  }

  /** Pseudo-relevance-feedback expansion
    * ([[Retrieval.bm25QueryExpansion]]): each suite query's BM25
    * top-5 feeds back, and the 3 best non-query terms of the feedback
    * docs (by exact-decimal idf · Σtf) come out as expansion terms —
    * retrieval, feedback join, exclusion, and the weight ranking all
    * replayed in one oracle. */
  val q180Bm25Prf = QueryDef(
    "q180_bm25_prf",
    s"""WITH ${scoredCtes(dfCapRatio = 1.0)},
       |r AS (
       |  SELECT query_id, doc_id,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id) AS INT) AS rnk
       |  FROM s
       |),
       |exp AS (
       |  SELECT r.query_id, post.term, dfs.df, tot.n_docs,
       |         CAST(sum(post.tf) AS BIGINT) AS sum_tf,
       |         CAST(count(*) AS BIGINT) AS n_docs_with_term
       |  FROM r
       |  JOIN post ON post.doc_id = r.doc_id
       |  JOIN dfs USING (term), tot
       |  WHERE r.rnk <= 5 AND NOT EXISTS (
       |    SELECT 1 FROM qt
       |    WHERE qt.query_id = r.query_id AND qt.term = post.term)
       |  GROUP BY r.query_id, post.term, dfs.df, tot.n_docs
       |),
       |ew AS (
       |  SELECT query_id, term,
       |    CAST(round(ln((2.0 * n_docs - 2.0 * df + 1.0) /
       |                  (2.0 * df + 1.0)), 6) AS DECIMAL(18,6)) *
       |    CAST(sum_tf AS DECIMAL(18,0)) AS weight,
       |    n_docs_with_term
       |  FROM exp
       |),
       |er AS (
       |  SELECT query_id, term, weight, n_docs_with_term,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY weight DESC, term) AS INT) AS rnk
       |  FROM ew
       |)
       |SELECT query_id, term, CAST(weight AS DOUBLE) AS weight,
       |       n_docs_with_term, rnk
       |FROM er WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin) { (s, d) =>
    graft.ops.Retrieval.bm25QueryExpansion(
        Tables.documents(s, d), querySuiteDf(s), k = 5, nTerms = 3)
      .select(col("query_id"), col("term"),
        col("weight").cast("double").as("weight"),
        col("n_docs_with_term"), col("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** The phrase suite: in-vocabulary word sequences (some present in
    * the corpus, one deliberately absent) plus a repeated-term phrase
    * exercising the distinct-offset rule. */
  private val PhraseSuite: Seq[(Long, String)] = Seq(
    0L -> "value table part",
    1L -> "the table",
    2L -> "fast merge batch",
    3L -> "a a",
    4L -> "dup dup dup")

  /** Exact phrase search ([[Retrieval.phraseSearch]]): candidate
    * starts from positional postings, an occurrence where every
    * phrase offset matches — the inverted-index phrase algorithm,
    * replayed in SQL from the same (term, doc, pos) explode with the
    * phrase terms as a VALUES table. All-integer, so counts and first
    * positions hash-compare. */
  val q183PhraseSearch = QueryDef(
    "q183_phrase_search", {
      val qvals = PhraseSuite.flatMap { case (id, text) =>
        val toks = text.split(" ")
        toks.zipWithIndex.map { case (t, off) =>
          s"($id, '$t', $off, ${toks.length})"
        }
      }.mkString(", ")
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
         |), p AS (
         |  SELECT doc_id, t[g.i] AS term, CAST(g.i - 1 AS BIGINT) AS pos
         |  FROM toks, unnest(generate_series(1, len(t))) AS g(i)
         |), q(phrase_id, term, off, plen) AS (VALUES $qvals),
         |cand AS (
         |  SELECT CAST(q.phrase_id AS BIGINT) AS phrase_id, p.doc_id,
         |         p.pos - q.off AS start, q.off, q.plen
         |  FROM p JOIN q ON p.term = q.term
         |  WHERE p.pos - q.off >= 0
         |), occ AS (
         |  SELECT phrase_id, doc_id, start
         |  FROM cand GROUP BY phrase_id, doc_id, start
         |  HAVING count(DISTINCT off) = max(plen)
         |)
         |SELECT phrase_id, doc_id, CAST(count(*) AS BIGINT) AS n_occurrences,
         |       min(start) AS first_pos
         |FROM occ GROUP BY phrase_id, doc_id
         |ORDER BY phrase_id, doc_id""".stripMargin
    }) { (s, d) =>
    import s.implicits._
    graft.ops.Retrieval.phraseSearch(Tables.documents(s, d),
        PhraseSuite.toDF("phrase_id", "phrase_text"))
      .orderBy(col("phrase_id"), col("doc_id"))
  }

  /** Hybrid retrieval ([[Retrieval.rrfFuse]], NEW round 10): for each
    * query document (every 100th doc, its TEXT as the lexical query
    * and its EMBEDDING as the semantic query — the aligned doc_id /
    * vec_id spaces make it the classic more-like-this task), fuse the
    * BM25 top-10 (self-excluded) with the exact-cosine top-10 by
    * integer-scaled reciprocal-rank fusion and keep the fused top-5.
    * Every stage replays: the lexical side is the q177 decimal
    * pipeline with query terms drawn from the corpus instead of a
    * VALUES suite, the semantic side is the q122 rounded-cosine
    * ranking, and the fusion is integer arithmetic — so the hybrid
    * ranking hash-compares end to end, ranks and scores included. */
  val q185HybridRrf = QueryDef(
    "q185_hybrid_rrf",
    s"""WITH p AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
       |), post AS (
       |  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
       |  FROM p GROUP BY term, doc_id
       |), dl AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
       |  FROM documents
       |), tot AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(dl) AS BIGINT) AS tot_tokens FROM dl
       |), dfs AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY term
       |), qt AS (
       |  SELECT DISTINCT query_id, term FROM (
       |    SELECT doc_id AS query_id,
       |           unnest(string_split(text, ' ')) AS term
       |    FROM documents WHERE doc_id % 100 = 0)
       |), scored AS (
       |  SELECT qt.query_id, post.doc_id,
       |    CAST(round(ln((2.0 * n_docs - 2.0 * df + 1.0) /
       |                  (2.0 * df + 1.0)), 6) AS DECIMAL(18,6)) *
       |    CAST(round((11.0 * tf * tot_tokens) /
       |               (10.0 * tot_tokens * tf + 3.0 * tot_tokens +
       |                9.0 * dl.dl * n_docs), 6) AS DECIMAL(18,6)) AS w
       |  FROM post
       |  JOIN qt USING (term) JOIN dfs USING (term) JOIN dl USING (doc_id), tot
       |  WHERE CAST(df AS DOUBLE) <= 0.5 * CAST(n_docs AS DOUBLE)
       |), s AS (
       |  SELECT query_id, doc_id, SUM(w) AS score
       |  FROM scored GROUP BY query_id, doc_id
       |), lexr AS (
       |  SELECT query_id, doc_id, rnk FROM (
       |    SELECT query_id, doc_id,
       |      CAST(row_number() OVER (PARTITION BY query_id
       |        ORDER BY score DESC, doc_id) AS INT) AS rnk
       |    FROM s WHERE doc_id <> query_id
       |  ) WHERE rnk <= 10
       |), e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), sq AS (
       |  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 100 = 0
       |), semr AS (
       |  SELECT query_id, doc_id, rnk FROM (
       |    SELECT sq.query_id, e.vec_id AS doc_id,
       |      CAST(row_number() OVER (PARTITION BY sq.query_id
       |        ORDER BY round(list_cosine_similarity(e.v, sq.qv), 6) DESC,
       |                 e.vec_id) AS INT) AS rnk
       |    FROM e, sq WHERE e.vec_id <> sq.query_id
       |  ) WHERE rnk <= 10
       |), fused AS (
       |  SELECT coalesce(l.query_id, m.query_id) AS query_id,
       |         coalesce(l.doc_id, m.doc_id) AS doc_id,
       |         CAST(coalesce(CAST(floor(1000000.0 / (60 + l.rnk)) AS BIGINT), 0)
       |            + coalesce(CAST(floor(1000000.0 / (60 + m.rnk)) AS BIGINT), 0)
       |           AS BIGINT) AS rrf_score,
       |         coalesce(l.rnk, 0) AS lex_rnk, coalesce(m.rnk, 0) AS sem_rnk
       |  FROM lexr l FULL OUTER JOIN semr m
       |    ON l.query_id = m.query_id AND l.doc_id = m.doc_id
       |)
       |SELECT query_id, doc_id, rrf_score, lex_rnk, sem_rnk, rnk FROM (
       |  SELECT query_id, doc_id, rrf_score, lex_rnk, sem_rnk,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY rrf_score DESC, doc_id) AS INT) AS rnk
       |  FROM fused
       |) WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val emb = Tables.embeddings(s, d)
    // query batch pinned to copy 0 (ScaleQueries.ProbeBatchFilter's
    // id bound): on the real testdata dirs every id is below the
    // ScaleBench copy stride, so the registered output (and the
    // oracle, which keeps the plain %100 filter) is unchanged — while
    // on a blown corpus the scalebench ratio measures retrieval cost
    // vs corpus size at a FIXED query workload instead of compounding
    // query-batch growth (the q159 round-9 lesson).
    val queriesDf = docs
      .filter(col("doc_id") % 100 === 0 && col("doc_id") < (1L << 33))
      .select(col("doc_id").as("query_id"), col("text").as("query_text"))
    val wLex = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    // dfCapRatio 0.5: a WHOLE DOCUMENT as the query makes every
    // stopword-class term a candidate generator (candidates ≈ corpus
    // per such term, ~10× the q177 suite's volume for zero ranking
    // signal — their idf is negative past 0.5 df anyway); pruning them
    // is the standard more-like-this "interesting terms" move, and the
    // cap comparison replays exactly (one IEEE product both sides)
    // Each constituent is localCheckpointed (eager) so the two
    // corpus-scale pipelines run SEQUENTIALLY to their |queries|·k
    // outputs before the fuse: without the cut, the full-outer join
    // schedules both upstream plans concurrently under one memory
    // manager — the round-10 lowmem sweep's largest spiller (2.4 GiB
    // at a 2 GiB heap over the 10× corpus) for a fuse whose own
    // inputs are broadcast-scale. The checkpointed frames are tiny
    // (≤ |queries|·10 rows each), so the pin costs nothing.
    val lex = Retrieval.bm25Scores(docs, queriesDf, dfCapRatio = 0.5)
      .filter(col("doc_id") =!= col("query_id"))
      .withColumn("rnk", row_number().over(wLex).cast("int"))
      .filter(col("rnk") <= 10)
      .select(col("query_id"), col("doc_id"), col("rnk"))
      .localCheckpoint()
    val sem = graft.ops.Similarity.annJoinBruteForce(
        emb.filter(col("vec_id") % 100 === 0 && col("vec_id") < (1L << 33)),
        emb, "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rnk"))
      .localCheckpoint()
    Retrieval.rrfFuse(lex, sem, k = 5)
      .select(col("query_id"), col("doc_id"), col("rrf_score"),
        col("rnk_a").as("lex_rnk"), col("rnk_b").as("sem_rnk"), col("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Retrieval-quality metrics as hash-checked VALUES
    * ([[graft.ops.RetrievalMetrics]], NEW round 10): the exact-cosine
    * top-10 ranking for every 50th vector, evaluated against
    * label-match relevance (same `label`, self excluded) — per query:
    * precision@10, recall@10, reciprocal rank, and nDCG@10 with
    * exact-decimal DCG sums. The q181 recall-as-metric idea
    * generalized to the full IR metric suite; every number in the
    * output — not just hit counts — replays in DuckDB. */
  val q186RankingMetrics = QueryDef(
    "q186_ranking_metrics",
    s"""WITH e AS (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings
       |), sq AS (
       |  SELECT vec_id AS query_id, label, v AS qv FROM e
       |  WHERE vec_id % 50 = 0
       |), r AS (
       |  SELECT query_id, doc_id, rnk FROM (
       |    SELECT sq.query_id, e.vec_id AS doc_id,
       |      CAST(row_number() OVER (PARTITION BY sq.query_id
       |        ORDER BY round(list_cosine_similarity(e.v, sq.qv), 6) DESC,
       |                 e.vec_id) AS INT) AS rnk
       |    FROM e, sq WHERE e.vec_id <> sq.query_id
       |  ) WHERE rnk <= 10
       |), rel AS (
       |  SELECT sq.query_id, e.vec_id AS doc_id
       |  FROM sq JOIN e ON e.label = sq.label AND e.vec_id <> sq.query_id
       |), hits AS (
       |  SELECT r.query_id, r.rnk FROM r JOIN rel
       |    ON r.query_id = rel.query_id AND r.doc_id = rel.doc_id
       |), perq AS (
       |  SELECT query_id, CAST(count(*) AS BIGINT) AS n_hit,
       |         min(rnk) AS first_rnk,
       |         SUM(CAST(round(1.0 / log2(CAST(rnk AS DOUBLE) + 1.0), 6)
       |             AS DECIMAL(18,6))) AS dcg
       |  FROM hits GROUP BY query_id
       |), nrel AS (
       |  SELECT query_id, CAST(count(*) AS BIGINT) AS n_relevant
       |  FROM rel GROUP BY query_id
       |), ideal AS (
       |  SELECT query_id,
       |         SUM(CAST(round(1.0 / log2(CAST(g.r AS DOUBLE) + 1.0), 6)
       |             AS DECIMAL(18,6))) AS idcg
       |  FROM nrel, unnest(generate_series(1, least(10, n_relevant))) AS g(r)
       |  GROUP BY query_id
       |)
       |SELECT n.query_id, n.n_relevant,
       |  coalesce(p.n_hit, 0) AS n_hit,
       |  round(CAST(coalesce(p.n_hit, 0) AS DOUBLE) / 10.0, 6)
       |    AS precision_at_k,
       |  round(CAST(coalesce(p.n_hit, 0) AS DOUBLE) /
       |        CAST(n.n_relevant AS DOUBLE), 6) AS recall_at_k,
       |  CAST(coalesce(p.first_rnk, 0) AS INT) AS first_hit_rnk,
       |  coalesce(round(1.0 / CAST(p.first_rnk AS DOUBLE), 6), 0.0) AS rr,
       |  CAST(coalesce(p.dcg, 0) AS DOUBLE) AS dcg,
       |  CAST(i.idcg AS DOUBLE) AS idcg,
       |  round(CAST(coalesce(p.dcg, 0) AS DOUBLE) / CAST(i.idcg AS DOUBLE), 6)
       |    AS ndcg
       |FROM nrel n
       |JOIN ideal i ON i.query_id = n.query_id
       |LEFT JOIN perq p ON p.query_id = n.query_id
       |ORDER BY n.query_id""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    // query batch pinned to copy 0 (the q185 convention)
    val queries = emb
      .filter(col("vec_id") % 50 === 0 && col("vec_id") < (1L << 33))
    val ranking = graft.ops.Similarity.annJoinBruteForce(
        queries, emb, "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rnk"))
    val relevance = queries
      .select(col("vec_id").as("query_id"), col("label").as("__qlabel"))
      .join(emb.select(col("vec_id").as("doc_id"), col("label")),
        col("label") === col("__qlabel") && col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id"))
    graft.ops.RetrievalMetrics.rankingMetrics(ranking, relevance, k = 10)
      .orderBy(col("query_id"))
  }

  // ------------------------------------------------------------------
  // Round 17: the UNICODE token path (the r16 verdict's #6 ask). The
  // legacy whitespace split gives an unsegmented CJK document ONE
  // giant pseudo-token — df ≈ 1 per "term", BM25 retrieves nothing.
  // [[graft.ops.Retrieval.postings]]' round-17 `tokenizer` parameter
  // plugs [[graft.ops.TextAnalysis.tokensUnicode]] in (character-
  // unigram segmentation for CJK, whitespace for everything else);
  // q226/q227 hash-certify it on a constructed mixed-script corpus.

  /** q224's construction pointed at CJK: a–z0–9 to 36 NFKC-stable CJK
    * ideographs (basic unified block — NFKC preserves them; the
    * compatibility block U+F900.. would be REMAPPED and break the
    * construction). No space mapping: word boundaries survive, so the
    * analytic oracle can replay per-character tokens by `translate`
    * over the legacy norm. Shared literally with the oracle. */
  private val Ascii36 = "abcdefghijklmnopqrstuvwxyz0123456789"
  private val Han36 =
    "一二三四五六七八九十百千万水火木金土日月山川田人口手目耳足車門馬魚鳥米貝"

  /** DuckDB spelling of the legacy normal form (the analytic base). */
  private val NormSql =
    "trim(regexp_replace(regexp_replace(lower(text), " +
      "'[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  /** Han-variant corpus: odd doc_ids become CJK (every letter/digit
    * an ideograph, spaces kept), even stay ASCII. */
  private def hanVariantDocs(s: org.apache.spark.sql.SparkSession,
                             d: String) =
    Tables.documents(s, d).select(col("doc_id"),
      when(col("doc_id") % 2 === 1,
          translate(col("text"), Ascii36, Han36))
        .otherwise(col("text")).as("text"))

  /** The ANALYTIC replay of [[graft.ops.TextAnalysis.tokensUnicode]]
    * over the variant corpus, as shared CTEs: ASCII docs tokenize to
    * the nonempty words of the legacy norm (unicode normalization is
    * byte-identical to legacy on ASCII — the q224 degeneracy); Han
    * docs tokenize to ONE TOKEN PER IDEOGRAPH = the translate of each
    * non-space char of the norm (normalization and `translate`
    * commute on the letters/digits-only map). `post` is the postings
    * table; `dl`/`tot`/`dfs` the BM25 sides. */
  private val UniToksCtes: String =
    s"""base AS (
       |  SELECT doc_id, $NormSql AS norm FROM documents
       |), toks AS (
       |  SELECT doc_id, unnest(list_filter(string_split(norm, ' '),
       |    x -> x <> '')) AS term
       |  FROM base WHERE doc_id % 2 = 0
       |  UNION ALL
       |  SELECT doc_id, translate(ch, '$Ascii36', '$Han36') AS term
       |  FROM (SELECT doc_id,
       |          unnest(string_split_regex(replace(norm, ' ', ''), ''))
       |            AS ch
       |        FROM base WHERE doc_id % 2 = 1)
       |  WHERE ch <> ''
       |), post AS (
       |  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
       |  FROM toks GROUP BY term, doc_id
       |), dl AS (
       |  SELECT doc_id, CAST(CASE WHEN doc_id % 2 = 1
       |      THEN len(replace(norm, ' ', ''))
       |      ELSE len(list_filter(string_split(norm, ' '), x -> x <> ''))
       |    END AS BIGINT) AS dl
       |  FROM base
       |), tot AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(dl) AS BIGINT) AS tot_tokens FROM dl
       |), dfs AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY term
       |)""".stripMargin

  /** Per-term inverted-index stats over the mixed-script corpus
    * through the unicode tokenizer: one row per term with its
    * document frequency and total tf. The hash certifies the thing
    * the legacy path cannot do: Han-class documents produce
    * PER-CHARACTER postings — single-ideograph terms whose df/tf
    * replay exactly from the analytic construction — while ASCII
    * documents keep word postings, in ONE index. Vocabulary-bounded
    * output (36 ideographs + the synthetic word vocab). */
  val q226UnicodePostings = QueryDef(
    "q226_unicode_postings",
    s"""WITH $UniToksCtes
       |SELECT term, CAST(count(*) AS BIGINT) AS df,
       |       CAST(sum(tf) AS BIGINT) AS tf_total
       |FROM post GROUP BY term ORDER BY term""".stripMargin) { (s, d) =>
    graft.ops.Retrieval.postings(hanVariantDocs(s, d),
        tokenizer = graft.ops.TextAnalysis.tokensUnicode(_))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("tf_total"))
      .orderBy(col("term"))
  }

  /** The mixed-script query suite: a Latin query, its all-CJK
    * translation, and a mixed-script query — each must retrieve in
    * ITS script class (and the mixed one in both). */
  private val UniQuerySuite: Seq[(Long, String)] = {
    def hanOf(q: String): String =
      q.map(c => { val i = Ascii36.indexOf(c)
        if (i >= 0) Han36(i) else c }).mkString
    Seq(
      0L -> "dup scan batch",
      1L -> hanOf("dup scan batch"),
      2L -> ("dup " + hanOf("scan")))
  }

  /** [[graft.ops.TextAnalysis.tokensUnicode]] replayed in plain Scala
    * for the FIXED query suite (already normalized by construction:
    * lowercase letters/ideographs/spaces only): every ideograph is
    * its own token, ASCII words split on spaces. Inlined as oracle
    * VALUES — the suite is a literal, so its segmentation is too. */
  private def uniTokens(q: String): Seq[String] =
    q.flatMap(c =>
        if (Han36.indexOf(c) >= 0) s" $c " else c.toString)
      .split(" +").filter(_.nonEmpty).toSeq

  private val UniQtValues: String = UniQuerySuite.flatMap {
    case (id, q) => uniTokens(q).distinct.map(t => s"($id, '$t')")
  }.mkString(", ")

  private def uniQuerySuiteDf(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    UniQuerySuite.toDF("query_id", "query_text")
  }

  /** BM25 top-5 over the mixed-script corpus, index AND queries
    * segmented by the unicode tokenizer (the [[graft.ops.Retrieval
    * .bm25TopK]] `tokenizer` thread-through): the CJK query ranks
    * Han-class documents by per-character match, the Latin query
    * ranks ASCII-class documents, and the mixed query hits both
    * classes in one ranking — none of which the whitespace tokenizer
    * can produce (it would glue each Han document into one
    * never-matching pseudo-token). Decimal scoring identical to
    * q177's; the oracle replays tokenization analytically and the
    * suite's segmentation as literal VALUES. */
  val q227Bm25Unicode = QueryDef(
    "q227_bm25_unicode",
    s"""WITH $UniToksCtes,
       |qt(query_id, term) AS (VALUES $UniQtValues),
       |scored AS (
       |  SELECT qt.query_id, post.doc_id,
       |    CAST(round(ln((2.0 * n_docs - 2.0 * df + 1.0) /
       |                  (2.0 * df + 1.0)), 6) AS DECIMAL(18,6)) *
       |    CAST(round((11.0 * tf * tot_tokens) /
       |               (10.0 * tot_tokens * tf + 3.0 * tot_tokens +
       |                9.0 * dl.dl * n_docs), 6) AS DECIMAL(18,6)) AS w
       |  FROM post
       |  JOIN qt USING (term) JOIN dfs USING (term) JOIN dl USING (doc_id),
       |    tot
       |), s AS (
       |  SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
       |         SUM(w) AS score, CAST(count(*) AS BIGINT) AS n_terms
       |  FROM scored GROUP BY query_id, doc_id
       |), r AS (
       |  SELECT query_id, doc_id, score, n_terms,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id) AS INT) AS rnk
       |  FROM s
       |)
       |SELECT query_id, doc_id, CAST(score AS DOUBLE) AS score, n_terms, rnk
       |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin) { (s, d) =>
    graft.ops.Retrieval.bm25TopK(hanVariantDocs(s, d), uniQuerySuiteDf(s),
        k = 5, tokenizer = graft.ops.TextAnalysis.tokensUnicode(_))
      .select(col("query_id"), col("doc_id"),
        col("score").cast("double").as("score"), col("n_terms"), col("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Per-document TF-IDF keyword extraction through the unicode
    * tokenizer over the mixed-script corpus (round 17 — the unicode
    * thread extended from retrieval into the text-analysis family:
    * [[graft.ops.TextAnalysis.tfidfKeywords]] gains the same
    * `tokenizer` parameter the BM25 family carries). The hash
    * certifies per-document keywords in BOTH script classes from ONE
    * index: Han-class documents rank single-ideograph terms by
    * tf·idf — the legacy split would glue each into one
    * document-unique pseudo-token with idf = ln(N), making every
    * CJK "keyword" maximally scored garbage — while ASCII documents
    * keep word keywords, with the q199 scoring discipline (idf =
    * round(ln(N/df), 6) as DECIMAL, exact long×decimal scores,
    * WindowGroupLimit rank ≤ 3). */
  val q228TfidfUnicode = QueryDef(
    "q228_tfidf_unicode",
    s"""WITH $UniToksCtes,
       |sc AS (
       |  SELECT post.doc_id, post.term, post.tf, dfs.df,
       |    post.tf * CAST(round(ln(
       |      CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6)
       |      AS DECIMAL(18,6)) AS score
       |  FROM post JOIN dfs USING (term), tot
       |)
       |SELECT doc_id, term, tf, df, CAST(score AS DOUBLE) AS score, rnk
       |FROM (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
       |        ORDER BY score DESC, term) AS INT) AS rnk FROM sc)
       |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin) { (s, d) =>
    graft.ops.TextAnalysis.tfidfKeywords(hanVariantDocs(s, d),
        "doc_id", "text", k = 3,
        tokenizer = graft.ops.TextAnalysis.tokensUnicode(_))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("score").cast("double").as("score"), col("rnk"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  // ------------------------------------------------------------------
  // Round 18: the unicode tokenizer threaded into the PIPELINE'S
  // token-consuming stages (the r17 verdict's #1 ask — token-count
  // sidecar, bigram LM, quality word statistics). q226–q228 certified
  // the per-character path in retrieval; these certify the SAME
  // Han-variant corpus through the three stage families that
  // previously hardwired the ASCII whitespace split — where an
  // unsegmented CJK document degenerated to ONE pseudo-token
  // (vocabulary garbage, no bigram evidence, mean_tok_len = doc
  // length).

  /** Ordered unicode token LISTS per document (the [[UniToksCtes]]
    * multiset construction, order-preserving) — the shape the bigram
    * LM and quality statistics replay from: ASCII docs keep the
    * nonempty words of the legacy norm in order; Han docs one token
    * per ideograph in character order (normalization and `translate`
    * commute on the letters/digits-only map). */
  private val UniTokListCtes: String =
    s"""base AS (
       |  SELECT doc_id, $NormSql AS norm FROM documents
       |), t AS (
       |  SELECT doc_id, list_filter(string_split(norm, ' '), x -> x <> '') AS ts
       |  FROM base WHERE doc_id % 2 = 0
       |  UNION ALL
       |  SELECT doc_id, list_transform(
       |      list_filter(string_split_regex(replace(norm, ' ', ''), ''),
       |        c -> c <> ''),
       |      c -> translate(c, '$Ascii36', '$Han36')) AS ts
       |  FROM base WHERE doc_id % 2 = 1
       |)""".stripMargin

  /** Token-count sidecar + rarity scoring through the unicode
    * tokenizer ([[graft.ops.Curation.writeTokenCountSidecar]] /
    * [[graft.ops.Curation.tokenRarityAgainstSidecar]], round-18
    * `tokenizer` parameter): the Han-variant corpus lands in two
    * tagged parity batches, the sidecar is compacted, and every
    * document is scored against the merged counts — q168's
    * incremental lifecycle with PER-CHARACTER counts for the CJK
    * class. The hash certifies what the legacy split cannot produce:
    * a Han document's n_toks is its ideograph count (not 1), its
    * rarity statistics come from the 36-ideograph frequency table
    * (not from one document-unique pseudo-token with cnt = 1), and
    * ASCII documents keep word statistics — one sidecar, both
    * scripts. */
  val q230UnicodeTokenSidecar = QueryDef(
    "q230_unicode_token_sidecar",
    s"""WITH $UniToksCtes,
       |tf AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt
       |       FROM toks GROUP BY term),
       |j AS (SELECT t.doc_id, f.cnt FROM toks t JOIN tf f ON t.term = f.term)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
       |       CAST(sum(cnt) AS BIGINT) AS sum_cnt,
       |       min(cnt) AS min_cnt,
       |       round(CAST(sum(cnt) AS DOUBLE) / count(*), 6) AS mean_cnt
       |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = hanVariantDocs(s, d)
    val sf = d.replaceAll("[^A-Za-z0-9.]", "_")
    val dir = s"target/tmp/q230_tokcnt_$sf"
    graft.sources.Sinks.wipeForRebuild(s, dir)
    val uni = graft.ops.TextAnalysis.tokensUnicode(_)
    graft.ops.Curation.writeTokenCountSidecar(
      docs.filter(col("doc_id") % 2 === 0), "text", dir, Some("even"), uni)
    graft.ops.Curation.writeTokenCountSidecar(
      docs.filter(col("doc_id") % 2 === 1), "text", dir, Some("odd"), uni)
    graft.ops.Curation.compactTokenCountSidecar(s, dir)
    graft.ops.Curation.tokenRarityAgainstSidecar(docs, dir,
        tokenizer = uni)
      .orderBy(col("doc_id"))
  }

  /** Per-document cross-entropy under the corpus's own AD-smoothed
    * bigram LM through the unicode tokenizer
    * ([[graft.ops.TextAnalysis.lmCrossEntropy]], round-18 `tokenizer`
    * parameter): q196's exact-replay chain (D = 3/4 fixed IEEE tree,
    * logp = round(ln(p_ad), 6) DECIMAL, exact Σ k·logp, one final
    * division) over the mixed-script corpus — Han documents
    * contribute CHARACTER bigrams (the standard character-level LM
    * for unsegmented scripts; under the legacy split each such doc
    * has ZERO bigram evidence and silently vanishes from the
    * perplexity filter), ASCII documents word bigrams, one LM. */
  val q231UnicodeLm = QueryDef(
    "q231_unicode_lm",
    s"""WITH $UniTokListCtes,
       |bg AS (SELECT doc_id,
       |         unnest(list_transform(generate_series(1, len(ts) - 1),
       |           i -> {'w1': ts[i], 'w2': ts[i + 1]})) AS b
       |       FROM t WHERE len(ts) >= 2),
       |dbg AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2,
       |          CAST(count(*) AS BIGINT) AS k
       |        FROM bg GROUP BY 1, 2, 3),
       |c12 AS (SELECT w1, w2, CAST(sum(k) AS BIGINT) AS c12
       |        FROM dbg GROUP BY 1, 2),
       |st AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
       |         CAST(count(*) AS BIGINT) AS n_succ FROM c12 GROUP BY 1),
       |ct AS (SELECT w2, CAST(count(*) AS BIGINT) AS n_prec
       |       FROM c12 GROUP BY 1),
       |ty AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM c12),
       |lm AS (SELECT c12.w1, c12.w2,
       |  CAST(round(ln(
       |    CAST(4 * c12.c12 - 3 AS DOUBLE) / CAST(4 * st.c1 AS DOUBLE)
       |    + (CAST(3 * st.n_succ AS DOUBLE) / CAST(4 * st.c1 AS DOUBLE))
       |      * (CAST(ct.n_prec AS DOUBLE) / CAST(ty.n_types AS DOUBLE))), 6)
       |    AS DECIMAL(18,6)) AS logp
       |  FROM c12 JOIN st USING (w1) JOIN ct USING (w2), ty),
       |agg AS (SELECT d.doc_id, CAST(sum(d.k) AS BIGINT) AS n_pairs,
       |          sum(CAST(d.k AS DECIMAL(20,0)) * lm.logp) AS sum_logp
       |        FROM dbg d JOIN lm ON lm.w1 = d.w1 AND lm.w2 = d.w2
       |        GROUP BY 1)
       |SELECT doc_id, n_pairs,
       |  CAST(-sum_logp AS DOUBLE) / CAST(n_pairs AS DOUBLE) AS cross_entropy
       |FROM agg ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.ops.TextAnalysis.lmCrossEntropy(hanVariantDocs(s, d),
        "doc_id", "text",
        tokenizer = graft.ops.TextAnalysis.tokensUnicode(_))
      .orderBy(col("doc_id"))
  }

  /** Quality word statistics through the unicode tokenizer
    * ([[graft.ops.TextAnalysis.qualityColumns]]' round-18
    * tokenizer-parameterized form) over the mixed-script corpus: a
    * Han document's n_tokens is its ideograph count with
    * mean_tok_len = 1.0 exactly (the legacy formula would report
    * n_tokens = words-of-spaces and charge the whole doc length to
    * each), stop_ratio ≈ 0 (an ENGLISH-marker signal, correctly
    * absent), and punct_ratio counts any-script letters/digits as
    * content (`\\p{L}\\p{N}` — under the legacy `[a-zA-Z0-9 ]` class
    * every ideograph counted as punctuation and the whole doc scored
    * as noise). Every ratio is one IEEE division of exact ints —
    * both script classes replay analytically. */
  val q232UnicodeQuality = QueryDef(
    "q232_unicode_quality",
    s"""WITH vbase AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 2 = 1
       |      THEN translate(text, '$Ascii36', '$Han36') ELSE text END AS vtext,
       |    $NormSql AS norm
       |  FROM documents
       |), t AS (
       |  SELECT doc_id, vtext,
       |    list_filter(string_split(norm, ' '), x -> x <> '') AS ts
       |  FROM vbase WHERE doc_id % 2 = 0
       |  UNION ALL
       |  SELECT doc_id, vtext, list_transform(
       |      list_filter(string_split_regex(replace(norm, ' ', ''), ''),
       |        c -> c <> ''),
       |      c -> translate(c, '$Ascii36', '$Han36')) AS ts
       |  FROM vbase WHERE doc_id % 2 = 1
       |)
       |SELECT doc_id,
       |  CAST(len(vtext) AS INT) AS n_chars,
       |  CAST(len(ts) AS INT) AS n_tokens,
       |  CAST(list_sum(list_transform(ts, x -> len(x))) AS DOUBLE) / len(ts)
       |    AS mean_tok_len,
       |  CAST(len(list_filter(ts, x -> x IN
       |      ('the', 'a', 'of', 'and', 'to', 'in', 'is'))) AS DOUBLE) / len(ts)
       |    AS stop_ratio,
       |  CAST(len(vtext) -
       |      len(regexp_replace(vtext, '[^\\p{L}\\p{N} ]', '', 'g'))
       |    AS DOUBLE) / len(vtext) AS punct_ratio
       |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
    val cols = graft.ops.TextAnalysis.qualityColumns(col("text"),
      graft.ops.TextAnalysis.tokensUnicode(_))
    hanVariantDocs(s, d)
      .select(col("doc_id") +: cols.map { case (n, c) => c.as(n) }: _*)
      .orderBy(col("doc_id"))
  }

  val all: Seq[QueryDef] = Seq(q177Bm25TopK, q178Bm25Decontam, q179Bm25Sidecar,
    q180Bm25Prf, q183PhraseSearch, q185HybridRrf, q186RankingMetrics,
    q226UnicodePostings, q227Bm25Unicode, q228TfidfUnicode,
    q230UnicodeTokenSidecar, q231UnicodeLm, q232UnicodeQuality)
}
