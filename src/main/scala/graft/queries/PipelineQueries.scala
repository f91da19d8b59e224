package graft.queries

import graft.QueryDef
import graft.ops.{Clustering, Relational, Similarity, TextAnalysis}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-4 training-data-pipeline queries: transitive dedup clustering
  * (connected components), document chunking, TF-IDF term statistics,
  * balanced shard packing, and int8 embedding quantization audit.
  * All five carry DuckDB oracles (the clustering one via a recursive
  * CTE — min-label reachability is expressible in ANSI SQL even though
  * the engine computes it iteratively).
  */
object PipelineQueries {

  /** Near-dup clusters = transitive closure of blocked Jaccard pairs.
    * Spark side: iterative min-label propagation
    * ([[Clustering.connectedComponents]], localCheckpoint per round);
    * oracle side: WITH RECURSIVE reachability + min label — different
    * algorithms, identical fixpoint. */
  val q103DedupClusters = QueryDef(
    "q103_dedup_clusters",
    """WITH RECURSIVE toks AS (
      |  SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS ts,
      |         len(string_split(text, ' ')) AS n_toks
      |  FROM documents
      |), pairs AS (
      |  SELECT a.doc_id AS src, b.doc_id AS dst
      |  FROM toks a JOIN toks b
      |    ON a.lang = b.lang AND (a.n_toks // 10) = (b.n_toks // 10)
      |       AND a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) /
      |        len(list_distinct(list_concat(a.ts, b.ts))) >= 0.7
      |), sym AS (
      |  SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs
      |), walk(node, label) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT s.dst, w.label FROM walk w JOIN sym s ON s.src = w.node
      |), comp AS (
      |  SELECT node AS doc_id, min(label) AS component FROM walk GROUP BY node
      |)
      |SELECT doc_id, component,
      |       COUNT(*) OVER (PARTITION BY component) AS cluster_size
      |FROM comp ORDER BY doc_id""".stripMargin) { (s, d) =>
    Clustering.jaccardDedupClusters(Tables.documents(s, d),
        threshold = 0.7, lenBlock = 10)
      .orderBy(col("doc_id"))
  }

  /** Fixed-token chunking with overlap (50-token windows, stride 25):
    * in-row generator, no shuffle — chunks at scan speed. Chunk text
    * leaves as md5 (compact, still proves byte equality). */
  val q104DocChunks = QueryDef(
    "q104_doc_chunks",
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
      |), starts AS (
      |  SELECT doc_id, ts,
      |         CAST(unnest(range(1, greatest(1, len(ts) - 25) + 1, 25)) AS BIGINT) AS s
      |  FROM toks
      |)
      |SELECT doc_id, (s - 1) // 25 AS chunk_idx,
      |       CAST(len(list_slice(ts, s, s + 49)) AS BIGINT) AS chunk_tokens,
      |       md5(array_to_string(list_slice(ts, s, s + 49), ' ')) AS chunk_hash
      |FROM starts ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
    TextAnalysis.chunk(Tables.documents(s, d), "text",
        chunkTokens = 50, overlap = 25, "doc_id")
      .select(col("doc_id"), col("chunk_idx"), col("chunk_tokens"),
        md5(col("chunk_text")).as("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Per-(lang, term) TF-IDF-style corpus stats. The weight is
    * tf·(n_docs/df) — log-free IDF so the value is bit-reproducible
    * cross-engine (monotone in the usual tf·log(N/df), so every
    * ranking is unchanged). */
  val q105TermStats = QueryDef(
    "q105_term_stats",
    """WITH ex AS (
      |  SELECT lang, doc_id, unnest(string_split(text, ' ')) AS term
      |  FROM documents
      |), stats AS (
      |  SELECT lang, term, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
      |  FROM ex GROUP BY 1, 2
      |), n AS (
      |  SELECT lang, COUNT(DISTINCT doc_id) AS n_docs FROM ex GROUP BY 1
      |)
      |SELECT s.lang, s.term, s.tf, s.df,
      |       CAST(s.tf AS DOUBLE) * n.n_docs / s.df AS weight
      |FROM stats s JOIN n USING (lang)
      |ORDER BY s.lang, s.term""".stripMargin) { (s, d) =>
    TextAnalysis.termStats(Tables.documents(s, d))
      .select(col("lang"), col("term"), col("tf"), col("df"), col("weight"))
      .orderBy(col("lang"), col("term"))
  }

  /** Balanced training-shard assignment: LPT round-robin over a
    * 2000-token budget ([[Relational.roundRobinShards]]). */
  val q106ShardPack = QueryDef(
    "q106_shard_pack",
    """WITH t AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
      |  FROM documents
      |), tot AS (
      |  SELECT (SUM(n_toks) + 1999) // 2000 AS n_shards FROM t
      |), rk AS (
      |  SELECT doc_id, n_toks,
      |         ROW_NUMBER() OVER (ORDER BY n_toks DESC, doc_id) AS rn
      |  FROM t
      |)
      |SELECT rk.doc_id,
      |       CAST((rn - 1) % greatest(n_shards, 1) AS BIGINT) AS shard,
      |       rk.n_toks
      |FROM rk, tot ORDER BY rk.doc_id""".stripMargin) { (s, d) =>
    val t = Tables.documents(s, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
    Relational.roundRobinShards(t, "doc_id", "n_toks", budget = 2000L)
      .orderBy(col("doc_id"))
  }

  /** Int8 quantization audit over the embeddings table
    * ([[Similarity.int8QuantStats]]): scale + worst-case
    * reconstruction error per vector, bit-identical cross-engine
    * (exactly-rounded IEEE ops, order-independent max). */
  val q107Int8Quant = QueryDef(
    "q107_int8_quant",
    """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
      |  127.0 / greatest(
      |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))),
      |    1e-12) AS scale,
      |  list_max(list_transform(embedding, x ->
      |    abs(CAST(x AS DOUBLE) -
      |        greatest(least(floor(CAST(x AS DOUBLE) * scale + 0.5), 127.0),
      |                 -127.0) / scale))) AS max_abs_err
      |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
    Similarity.int8QuantStats(Tables.embeddings(s, d), "vec_id", "embedding")
      .select(col("vec_id"), col("dim"), col("scale"), col("max_abs_err"))
      .orderBy(col("vec_id"))
  }

  /** End-to-end canonical dedup: clusters → survivors (doc_id ==
    * component) → per-lang corpus stats of the deduplicated corpus —
    * what a training pipeline actually ships after near-dup removal. */
  val q108DedupSurvivors = QueryDef(
    "q108_dedup_survivors",
    """WITH RECURSIVE toks AS (
      |  SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS ts,
      |         len(string_split(text, ' ')) AS n_toks
      |  FROM documents
      |), pairs AS (
      |  SELECT a.doc_id AS src, b.doc_id AS dst
      |  FROM toks a JOIN toks b
      |    ON a.lang = b.lang AND (a.n_toks // 10) = (b.n_toks // 10)
      |       AND a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) /
      |        len(list_distinct(list_concat(a.ts, b.ts))) >= 0.7
      |), sym AS (
      |  SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs
      |), walk(node, label) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT s.dst, w.label FROM walk w JOIN sym s ON s.src = w.node
      |), comp AS (
      |  SELECT node AS doc_id, min(label) AS component FROM walk GROUP BY node
      |)
      |SELECT d.lang, COUNT(*) AS n_docs,
      |       CAST(SUM(len(string_split(d.text, ' '))) AS BIGINT) AS n_tokens
      |FROM comp c JOIN documents d ON c.doc_id = d.doc_id
      |WHERE c.doc_id = c.component
      |GROUP BY d.lang ORDER BY d.lang""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val survivors = Clustering.jaccardDedupClusters(docs,
        threshold = 0.7, lenBlock = 10)
      .where(col("doc_id") === col("component"))
      .select("doc_id")
    survivors.join(docs, "doc_id")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
      .orderBy(col("lang"))
  }

  /** Deterministic weighted sample (A-ES priorities from md5-derived
    * uniforms, [[Relational.weightedSample]]): oracled — md5 is
    * cross-engine identical, so both engines derive the SAME 60-bit
    * uniforms; the only non-portable op is ln, which enters ONLY the
    * comparator (-ln(u)/w). A 1-ulp libm divergence could flip the
    * selection only if priorities #k and #k+1 collide to ~1e-16
    * relative — md5 uniforms make that measure-zero (validated at
    * both sf0.001 and sf0.01). Output carries no doubles at all.
    * DuckDB parses the 15-hex-char md5 prefix via CAST('0x…'). */
  val q109WeightedSample = QueryDef(
    "q109_weighted_sample",
    """WITH pri AS (
      |  SELECT doc_id, n_chars,
      |    -ln((CAST(CAST('0x' || substring(
      |         md5(CAST(doc_id AS VARCHAR) || '|42'), 1, 15) AS BIGINT)
      |       AS DOUBLE) + 1.0) / 1.152921504606847e18) / n_chars AS priority
      |  FROM documents
      |)
      |, sel AS (
      |  SELECT doc_id, n_chars FROM pri ORDER BY priority LIMIT 100
      |)
      |SELECT doc_id, n_chars FROM sel ORDER BY doc_id""".stripMargin) { (s, d) =>
    Relational.weightedSample(
        Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", k = 100)
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Correlated EXISTS / NOT EXISTS via the SQL front end — planned by
    * Catalyst as left-semi and left-anti joins (no per-row subquery
    * execution, unlike a naive engine). Completes the subquery surface
    * next to IN/NOT IN (q65) and scalar subqueries (q91). */
  val q110ExistsSubquery = QueryDef(
    "q110_exists_subquery",
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_totalprice > 300000)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d).createOrReplaceTempView("customer_v110")
    Tables.orders(s, d).createOrReplaceTempView("orders_v110")
    s.sql(
      """SELECT c_custkey, c_name FROM customer_v110 c
        |WHERE EXISTS (SELECT 1 FROM orders_v110 o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 300000)
        |  AND NOT EXISTS (SELECT 1 FROM orders_v110 o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin)
  }

  /** LATERAL correlated subquery: each nation's top-2 customers by
    * account balance — the SQL-standard form of the per-group top-k
    * the engine also serves via window functions (q07) and the native
    * TopKPerGroup operator (q59). Catalyst decorrelates to a join. */
  val q111Lateral = QueryDef(
    "q111_lateral",
    """SELECT n.n_name, t.c_custkey, t.c_acctbal FROM nation n,
      |  LATERAL (SELECT c_custkey, c_acctbal FROM customer c
      |           WHERE c.c_nationkey = n.n_nationkey
      |           ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
      |ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey""".stripMargin) { (s, d) =>
    Tables.nation(s, d).createOrReplaceTempView("nation_v111")
    Tables.customer(s, d).createOrReplaceTempView("customer_v111")
    s.sql(
      """SELECT n.n_name, t.c_custkey, t.c_acctbal FROM nation_v111 n,
        |  LATERAL (SELECT c_custkey, c_acctbal FROM customer_v111 c
        |           WHERE c.c_nationkey = n.n_nationkey
        |           ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        |ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey""".stripMargin)
  }

  /** Linear interpolation of planted gaps in the event stream
    * ([[Relational.linearInterpolate]]): every 7th event's value is
    * nulled, then refilled from its temporal neighbors per user. One
    * shuffle, two ignore-nulls windows, bit-reproducible arithmetic. */
  val q112LinearInterp = QueryDef(
    "q112_linear_interp",
    """WITH src AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS t_us,
      |         CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
      |  FROM events
      |), w AS (
      |  SELECT event_id, user_id, t_us, v,
      |    last_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY t_us, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
      |    last_value(CASE WHEN v IS NOT NULL THEN t_us END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY t_us, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
      |    first_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY t_us, event_id
      |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
      |    first_value(CASE WHEN v IS NOT NULL THEN t_us END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY t_us, event_id
      |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
      |  FROM src
      |)
      |SELECT event_id, user_id, t_us,
      |  CASE WHEN v IS NOT NULL THEN v
      |       ELSE pv + (nv - pv) * CAST(t_us - pt AS DOUBLE) /
      |            CAST(nt - pt AS DOUBLE) END AS v_filled
      |FROM w ORDER BY user_id, t_us, event_id""".stripMargin) { (s, d) =>
    val src = Tables.events(s, d).select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("t_us"),
      when(col("event_id") % 7 === 0, lit(null).cast("double"))
        .otherwise(col("value")).as("v"))
    Relational.linearInterpolate(src, "v", "t_us", Seq("user_id"),
        tiebreak = Seq("event_id"))
      .select(col("event_id"), col("user_id"), col("t_us"),
        col("v").as("v_filled"))
      .orderBy(col("user_id"), col("t_us"), col("event_id"))
  }

  val all: Seq[QueryDef] = Seq(
    q103DedupClusters, q104DocChunks, q105TermStats, q106ShardPack,
    q107Int8Quant, q108DedupSurvivors, q109WeightedSample,
    q110ExistsSubquery, q111Lateral, q112LinearInterp)
}
