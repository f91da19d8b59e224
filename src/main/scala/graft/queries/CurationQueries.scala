package graft.queries

import graft.QueryDef
import graft.ops.Curation
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-4 corpus-curation queries: benchmark decontamination,
  * repetition quality signals, PII redaction, tokenizer vocabulary
  * coverage, and an event funnel. All five carry DuckDB oracles.
  */
object CurationQueries {

  /** Benchmark decontamination (exact 3-gram overlap): docs with
    * `doc_id % 19 = 0` stand in for the held-out benchmark; every
    * other doc reports what fraction of its distinct word 3-grams
    * leak from that set. 3-grams (not the production 8) because the
    * synthetic corpus draws from a ~30-word vocabulary — real text
    * would pin 8. Eval grams broadcast; ONE shuffle (the per-doc agg). */
  val q113Decontam = QueryDef(
    "q113_decontam",
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
      |), grams AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |      generate_series(1, len(ts) - 2),
      |      i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS g
      |  FROM toks WHERE len(ts) >= 3
      |), eval_g AS (
      |  SELECT DISTINCT g FROM grams WHERE doc_id % 19 = 0
      |), hits AS (
      |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
      |         CAST(sum(CASE WHEN e.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n_hit
      |  FROM grams t LEFT JOIN eval_g e ON t.g = e.g
      |  WHERE t.doc_id % 19 <> 0
      |  GROUP BY t.doc_id
      |)
      |SELECT doc_id, n_grams, n_hit,
      |       CAST(n_hit AS DOUBLE) / n_grams AS contamination,
      |       CAST(n_hit AS DOUBLE) / n_grams >= 0.05 AS contaminated
      |FROM hits ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    Curation.decontaminate(
        train = docs.filter(col("doc_id") % 19 =!= 0),
        evalDocs = docs.filter(col("doc_id") % 19 === 0),
        n = 3, threshold = 0.05)
      .orderBy(col("doc_id"))
  }

  /** Gopher-style repetition signals: duplicate-word fraction,
    * top-word share, duplicate-bigram fraction per document. Bigram
    * stats ride in-row; one shuffle chain (doc×word then doc). */
  val q114Repetition = QueryDef(
    "q114_repetition",
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
      |), br AS (
      |  SELECT doc_id, ts,
      |    CAST(len(list_transform(generate_series(1, len(ts) - 1),
      |      i -> ts[i] || ' ' || ts[i+1])) AS BIGINT) AS nb,
      |    CAST(len(list_distinct(list_transform(generate_series(1, len(ts) - 1),
      |      i -> ts[i] || ' ' || ts[i+1]))) AS BIGINT) AS nbd
      |  FROM toks
      |), ex AS (
      |  SELECT doc_id, nb, nbd, unnest(ts) AS w FROM br
      |), wc AS (
      |  SELECT doc_id, nb, nbd, w, CAST(count(*) AS BIGINT) AS c
      |  FROM ex GROUP BY 1, 2, 3, 4
      |), agg AS (
      |  SELECT doc_id, nb, nbd, CAST(sum(c) AS BIGINT) AS n_toks,
      |         CAST(count(*) AS BIGINT) AS n_distinct, max(c) AS top_cnt
      |  FROM wc GROUP BY 1, 2, 3
      |)
      |SELECT doc_id, n_toks, n_distinct,
      |  CAST(n_toks - n_distinct AS DOUBLE) / n_toks AS dup_word_frac,
      |  CAST(top_cnt AS DOUBLE) / n_toks AS top_word_share,
      |  CASE WHEN nb = 0 THEN 0.0
      |       ELSE CAST(nb - nbd AS DOUBLE) / nb END AS dup_bigram_frac
      |FROM agg ORDER BY doc_id""".stripMargin) { (s, d) =>
    Curation.repetitionSignals(Tables.documents(s, d)).orderBy(col("doc_id"))
  }

  /** PII redaction audit: a deterministic contact blob is synthesized
    * from customer fields (the slimmed testdata schema carries no real
    * phone/comment columns), then emails and phone numbers are
    * scrubbed and counted. Every step is a codegen'd per-row
    * projection — scan-speed at any scale; the redacted text leaves as
    * md5 (compact, still proves byte equality). One in three
    * customers has no phone so the audit counts actually vary. */
  val q115PiiScrub = QueryDef(
    "q115_pii_scrub",
    """WITH t AS (
      |  SELECT c_custkey,
      |    c_name || ' reachable at ' || replace(lower(c_name), '#', '.')
      |      || '@example.com'
      |      || CASE WHEN c_custkey % 3 = 0 THEN ''
      |              ELSE ' or ' || lpad(CAST((c_custkey * 7919) % 1000
      |                     AS VARCHAR), 3, '0')
      |                   || '-' || lpad(CAST((c_custkey * 104729) % 10000
      |                     AS VARCHAR), 4, '0') END
      |      || ' segment ' || c_mktsegment AS blob
      |  FROM customer
      |)
      |SELECT c_custkey,
      |  CAST(len(regexp_extract_all(blob, '[a-z0-9.]+@[a-z0-9.]+')) AS BIGINT)
      |    AS n_email,
      |  CAST(len(regexp_extract_all(blob, '[0-9]{3}-[0-9]{4}')) AS BIGINT)
      |    AS n_phone,
      |  md5(regexp_replace(regexp_replace(blob,
      |    '[a-z0-9.]+@[a-z0-9.]+', '[EMAIL]', 'g'),
      |    '[0-9]{3}-[0-9]{4}', '[PHONE]', 'g')) AS redacted_md5
      |FROM t ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val phone = concat(
      lpad(((col("c_custkey") * 7919) % 1000).cast("string"), 3, "0"),
      lit("-"),
      lpad(((col("c_custkey") * 104729) % 10000).cast("string"), 4, "0"))
    val blob = concat(
      col("c_name"), lit(" reachable at "),
      regexp_replace(lower(col("c_name")), "#", "."), lit("@example.com"),
      when(col("c_custkey") % 3 === 0, lit(""))
        .otherwise(concat(lit(" or "), phone)),
      lit(" segment "), col("c_mktsegment"))
    val audited = Curation.piiRedact(blob)
    Tables.customer(s, d)
      .select(col("c_custkey") +: audited.map { case (n, c) => c.as(n) }: _*)
      .select(col("c_custkey"), col("n_email"), col("n_phone"),
        md5(col("redacted").cast("binary")).as("redacted_md5"))
      .orderBy(col("c_custkey"))
  }

  /** Tokenizer vocabulary coverage: frequency-ranked words with
    * cumulative token-mass share and the 95%-coverage vocab cut. The
    * ranking window runs over the VOCABULARY (post-agg, tiny), never
    * the corpus. */
  val q116VocabCoverage = QueryDef(
    "q116_vocab_coverage",
    """WITH ex AS (
      |  SELECT unnest(string_split(text, ' ')) AS w FROM documents
      |), wc AS (
      |  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM ex GROUP BY 1
      |), r AS (
      |  SELECT w, cnt,
      |    CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, w) AS INT) AS rnk,
      |    CAST(SUM(cnt) OVER (ORDER BY cnt DESC, w
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |    CAST(SUM(cnt) OVER () AS BIGINT) AS total
      |  FROM wc
      |)
      |SELECT w, cnt, rnk, CAST(cum AS DOUBLE) / total AS cum_share,
      |  CAST(cum AS DOUBLE) / total <= 0.95 AS in_vocab
      |FROM r ORDER BY rnk""".stripMargin) { (s, d) =>
    Curation.vocabCoverage(Tables.documents(s, d), coverage = 0.95)
      .withColumnRenamed("rank", "rnk")
      .orderBy(col("rnk"))
  }

  /** Ordered event funnel on first occurrences: view → click →
    * purchase, sequenced by per-user min timestamps. One per-user
    * aggregation shuffle; the final rollup is a single row.
    * Timestamps are compared, never emitted (ns→µs parity). */
  val q117Funnel = QueryDef(
    "q117_funnel",
    """WITH m AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
      |    min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
      |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      |  FROM events GROUP BY 1
      |), a AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_users,
      |    CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_view,
      |    CAST(sum(CASE WHEN t_click > t_view THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_view_click,
      |    CAST(sum(CASE WHEN t_purchase > t_click AND t_click > t_view
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_funnel
      |  FROM m
      |)
      |SELECT n_users, n_view, n_view_click, n_funnel,
      |  CASE WHEN n_view = 0 THEN 0.0
      |       ELSE CAST(n_view_click AS DOUBLE) / n_view END AS conv_click,
      |  CASE WHEN n_view_click = 0 THEN 0.0
      |       ELSE CAST(n_funnel AS DOUBLE) / n_view_click END AS conv_purchase
      |FROM a""".stripMargin) { (s, d) =>
    val m = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("t_view"),
        min(when(col("event_type") === "click", col("ts"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
    m.agg(
        count(lit(1)).as("n_users"),
        sum(when(col("t_view").isNotNull, 1L).otherwise(0L)).as("n_view"),
        sum(when(col("t_click") > col("t_view"), 1L).otherwise(0L))
          .as("n_view_click"),
        sum(when(col("t_purchase") > col("t_click") &&
          col("t_click") > col("t_view"), 1L).otherwise(0L)).as("n_funnel"))
      .select(col("n_users"), col("n_view"), col("n_view_click"),
        col("n_funnel"),
        when(col("n_view") === 0L, lit(0.0))
          .otherwise(col("n_view_click").cast("double") / col("n_view"))
          .as("conv_click"),
        when(col("n_view_click") === 0L, lit(0.0))
          .otherwise(col("n_funnel").cast("double") / col("n_view_click"))
          .as("conv_purchase"))
  }

  val all: Seq[QueryDef] = Seq(
    q113Decontam, q114Repetition, q115PiiScrub, q116VocabCoverage, q117Funnel)
}
