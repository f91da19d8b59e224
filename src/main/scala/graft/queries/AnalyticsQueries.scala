package graft.queries

import graft.QueryDef
import graft.ops.{Dedup, Relational, Sketches}
import graft.sources.{Bucketing, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-7 second block: exact distributed analytics the approximate
  * family already covers probabilistically — exact rank-selected
  * quantiles (per-group AND global, q84's approx twin), co-located
  * bucketed joins (the write-time shuffle kill), edit-distance-
  * verified near-dup pairs (the character-level verifier the set-
  * based dedup family lacks), and the exact cross-source overlap
  * matrix (q139's HLL screen, ground-truthed). All five carry DuckDB
  * oracles.
  */
object AnalyticsQueries {

  private val Ps = Seq(0.25, 0.5, 0.75, 0.9, 0.99)
  private val PsSql = "[0.25, 0.5, 0.75, 0.9, 0.99]::DOUBLE[]"

  /** Exact per-group percentiles ([[Relational.exactQuantiles]]) of
    * l_extendedprice per return flag: rank selection under a TOTAL
    * order (value, orderkey, linenumber), so the selected row — not
    * just the value — is deterministic and the oracle replays it with
    * a plain ROW_NUMBER. One group-partitioned window shuffle; the ps
    * explode inside the same projection. */
  val q161ExactQuantiles = QueryDef(
    "q161_exact_quantiles",
    s"""WITH r AS (
       |  SELECT l_returnflag, l_extendedprice,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag
       |      ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS BIGINT)
       |      AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
       |  FROM lineitem
       |), ps AS (SELECT unnest($PsSql) AS p)
       |SELECT l_returnflag, p, l_extendedprice AS quantile, n AS n_rows
       |FROM r CROSS JOIN ps
       |WHERE rn = greatest(1, CAST(ceil(n * p) AS BIGINT))
       |ORDER BY l_returnflag, p""".stripMargin) { (s, d) =>
    Relational.exactQuantiles(Tables.lineitem(s, d),
        groupCols = Seq("l_returnflag"), valueCol = "l_extendedprice",
        tieCols = Seq("l_orderkey", "l_linenumber"), ps = Ps)
      .orderBy(col("l_returnflag"), col("p"))
  }

  /** Exact GLOBAL percentiles ([[Relational.exactQuantilesGlobal]]) of
    * events.value: same rank selection, but the rank comes from the
    * DISTRIBUTED global-rank primitive (range partitions + local
    * windows + bounded offsets) — "exact p99 of the whole column"
    * with no single-reducer window, the shape q84's sketch
    * approximates. */
  val q162GlobalQuantiles = QueryDef(
    "q162_global_quantiles",
    s"""WITH r AS (
       |  SELECT value,
       |    CAST(ROW_NUMBER() OVER (ORDER BY value, event_id) AS BIGINT)
       |      AS rn,
       |    CAST(COUNT(*) OVER () AS BIGINT) AS n
       |  FROM events
       |), ps AS (SELECT unnest($PsSql) AS p)
       |SELECT p, value AS quantile, n AS n_rows
       |FROM r CROSS JOIN ps
       |WHERE rn = greatest(1, CAST(ceil(n * p) AS BIGINT))
       |ORDER BY p""".stripMargin) { (s, d) =>
    Relational.exactQuantilesGlobal(
        Tables.events(s, d).select(col("value"), col("event_id")),
        valueCol = "value", tieCols = Seq("event_id"), ps = Ps)
      .orderBy(col("p"))
  }

  /** Co-located bucketed join ([[Bucketing.writeBucketedTable]]):
    * orders and lineitem both written CLUSTERED BY orderkey INTO 8
    * BUCKETS, then joined — the join plans with ZERO exchanges
    * (BucketingSpec asserts it); at 100 TB this is the
    * pay-the-shuffle-once-at-ingest pattern for every
    * fact-to-fact join that recurs. Results oracled against the plain
    * join on the raw tables (bucketing must not change semantics);
    * revenue through decimal operands (the q01 pattern) so the sum is
    * partitioning-independent. */
  val q163BucketedJoin = QueryDef(
    "q163_bucketed_join",
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |    (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
      |    AS DOUBLE) AS revenue
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    val sf = d.replaceAll("[^A-Za-z0-9.]", "_").replace(".", "_")
    val base = s"target/tmp/q163_buckets_$sf"
    Bucketing.writeBucketedTable(
      Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority")),
      table = s"g_orders_$sf", path = s"$base/orders",
      bucketCols = Seq("o_orderkey"), numBuckets = 8,
      sortCols = Seq("o_orderkey"))
    Bucketing.writeBucketedTable(
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
      table = s"g_lineitem_$sf", path = s"$base/lineitem",
      bucketCols = Seq("l_orderkey"), numBuckets = 8,
      sortCols = Seq("l_orderkey"))
    Bucketing.table(s, s"g_orders_$sf")
      .join(Bucketing.table(s, s"g_lineitem_$sf"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast(DecimalType(12, 2)) *
            (lit(1).cast(DecimalType(4, 2)) -
              col("l_discount").cast(DecimalType(4, 2))))
          .cast("double").as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** Edit-distance-verified near-dup pairs
    * ([[Dedup.editDistancePairs]]): normalized-prefix blocking +
    * bounded Levenshtein — the character-level verifier. Every piece
    * (normalization regexes, prefix block, levenshtein, the sim
    * division) replays in DuckDB, so unlike the hash-seeded candidate
    * generators this one is hash-oracled end-to-end. */
  val q164EditDistancePairs = QueryDef(
    "q164_edit_distance_pairs",
    """WITH norm AS (
      |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
      |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS nt
      |  FROM documents
      |), blk AS (
      |  SELECT doc_id, nt, substring(nt, 1, 12) AS bk FROM norm
      |), sized AS (
      |  SELECT doc_id, nt, bk, count(*) OVER (PARTITION BY bk) AS bn
      |  FROM blk
      |), ok AS (
      |  SELECT doc_id, nt, bk FROM sized WHERE bn BETWEEN 2 AND 50
      |), pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |         CAST(levenshtein(a.nt, b.nt) AS BIGINT) AS dist,
      |         round(CAST(1 AS DOUBLE) -
      |           CAST(levenshtein(a.nt, b.nt) AS DOUBLE) /
      |           CAST(greatest(len(a.nt), len(b.nt)) AS DOUBLE), 6) AS sim
      |  FROM ok a JOIN ok b ON a.bk = b.bk AND a.doc_id < b.doc_id
      |)
      |SELECT id_a, id_b, dist, sim FROM pairs WHERE dist <= 40
      |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    Dedup.editDistancePairs(Tables.documents(s, d), "text", "doc_id",
        prefixLen = 12, maxDist = 40, blockCap = 50)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Exact cross-source 5-gram overlap matrix
    * ([[Sketches.exactOverlapMatrix]]): the ground truth q139's HLL
    * inclusion–exclusion estimates — every source pair's exact shared
    * distinct-gram count and Jaccard, disjoint pairs included as 0. */
  val q165ExactOverlap = QueryDef(
    "q165_exact_overlap",
    """WITH toks AS (
      |  SELECT source, string_split(text, ' ') AS ts FROM documents
      |), grams AS (
      |  SELECT DISTINCT source, unnest(list_distinct(list_transform(
      |      generate_series(1, len(ts) - 4),
      |      i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' ||
      |           ts[i+3] || ' ' || ts[i+4]))) AS g
      |  FROM toks WHERE len(ts) >= 5
      |), counts AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_grams
      |  FROM grams GROUP BY source
      |), shared AS (
      |  SELECT a.source AS group_a, b.source AS group_b,
      |         CAST(count(*) AS BIGINT) AS n_shared
      |  FROM grams a JOIN grams b ON a.g = b.g AND a.source < b.source
      |  GROUP BY 1, 2
      |), pairs AS (
      |  SELECT ca.source AS group_a, cb.source AS group_b,
      |         ca.n_grams AS n_a, cb.n_grams AS n_b
      |  FROM counts ca JOIN counts cb ON ca.source < cb.source
      |)
      |SELECT p.group_a, p.group_b, p.n_a, p.n_b,
      |  coalesce(s.n_shared, CAST(0 AS BIGINT)) AS n_shared,
      |  round(CAST(coalesce(s.n_shared, 0) AS DOUBLE) /
      |    CAST(p.n_a + p.n_b - coalesce(s.n_shared, 0) AS DOUBLE), 6)
      |    AS jaccard
      |FROM pairs p LEFT JOIN shared s
      |  ON s.group_a = p.group_a AND s.group_b = p.group_b
      |ORDER BY p.group_a, p.group_b""".stripMargin) { (s, d) =>
    Sketches.exactOverlapMatrix(Tables.documents(s, d),
        groupCol = "source", textCol = "text", n = 5)
      .orderBy(col("group_a"), col("group_b"))
  }

  /** Histogram-sidecar quantiles ([[Sketches.writeHistSidecar]] /
    * [[Sketches.histQuantiles]]): the mergeable-percentile
    * pre-aggregation — the quantile twin of the q135 HLL sidecar, but
    * STRONGER: bin counts are additive exact longs, so the merged
    * sidecar equals a from-scratch build long-for-long and the whole
    * path (binning → merge → cumulative rank selection) replays in
    * DuckDB. The corpus lands in TWO parity batches (the q168
    * discipline); estimates are bin lower edges under the q161
    * greatest(1, ceil(n·p)) rank rule — within one bin width (5.0) of
    * the exact quantile, tightened by adding bins, never by a rescan. */
  val q170HistSidecarQuantiles = QueryDef(
    "q170_hist_sidecar_quantiles",
    s"""WITH b AS (
       |  SELECT event_type,
       |    least(greatest(CAST(floor((value - 0.0) / 5.0) AS BIGINT), 0), 99)
       |      AS bin
       |  FROM events
       |), h AS (
       |  SELECT event_type, bin, CAST(count(*) AS BIGINT) AS cnt
       |  FROM b GROUP BY 1, 2
       |), c AS (
       |  SELECT event_type, bin, cnt,
       |    CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS BIGINT)
       |      AS cum,
       |    CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
       |  FROM h
       |), ps AS (SELECT unnest($PsSql) AS p)
       |SELECT event_type, p, 0.0 + bin * 5.0 AS quantile_lo, n AS n_rows
       |FROM c CROSS JOIN ps
       |WHERE cum - cnt < greatest(1, CAST(ceil(n * p) AS BIGINT))
       |  AND greatest(1, CAST(ceil(n * p) AS BIGINT)) <= cum
       |ORDER BY event_type, p""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val sf = d.replaceAll("[^A-Za-z0-9.]", "_")
    val dir = s"target/tmp/q170_hist_$sf"
    graft.sources.Sinks.wipeForRebuild(s, dir)
    // tagged appends (round 17): the hash gate now runs the
    // exactly-once path with the oracle unchanged
    Sketches.writeHistSidecar(ev.filter(col("event_id") % 2 === 0),
      Seq("event_type"), "value", dir, lo = 0.0, hi = 500.0, bins = 100,
      batchId = Some("even"))
    Sketches.writeHistSidecar(ev.filter(col("event_id") % 2 === 1),
      Seq("event_type"), "value", dir, lo = 0.0, hi = 500.0, bins = 100,
      batchId = Some("odd"))
    Sketches.histQuantiles(
        Sketches.mergedHistogram(s, dir, Seq("event_type")),
        Seq("event_type"), Ps, lo = 0.0, hi = 500.0, bins = 100)
      .orderBy(col("event_type"), col("p"))
  }

  /** Trailing-window quantiles over per-hour histograms
    * ([[Sketches.periodHistograms]] + [[Sketches.rollingQuantiles]]):
    * "p99 of the last 6 hours, for every hour" answered from
    * periods×bins pre-aggregated rows — never a rescan of raw events.
    * The rolling twin of q170 and the exact-long analogue of q141's
    * rolling distinct: additive bin counts make the ENTIRE rolling
    * computation (densified grid, gap-tolerant RANGE trailing sums,
    * cumulative rank selection) DuckDB-replayable where the HLL
    * version is rows-only by construction. */
  val q171RollingQuantiles = QueryDef(
    "q171_rolling_quantiles",
    """WITH e AS (
      |  SELECT epoch_us(ts) // 3600000000 AS period,
      |    least(greatest(CAST(floor((value - 0.0) / 5.0) AS BIGINT), 0), 99)
      |      AS bin
      |  FROM events
      |), h AS (
      |  SELECT period, bin, CAST(count(*) AS BIGINT) AS cnt
      |  FROM e GROUP BY 1, 2
      |), grid AS (
      |  SELECT p.period, b.bin, coalesce(h.cnt, CAST(0 AS BIGINT)) AS cnt
      |  FROM (SELECT DISTINCT period FROM h) p
      |  CROSS JOIN (SELECT DISTINCT bin FROM h) b
      |  LEFT JOIN h ON h.period = p.period AND h.bin = b.bin
      |), t AS (
      |  SELECT period, bin, cnt,
      |    CAST(SUM(cnt) OVER (PARTITION BY bin ORDER BY period
      |      RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT) AS tcnt
      |  FROM grid
      |), c AS (
      |  SELECT period, bin, tcnt,
      |    CAST(SUM(tcnt) OVER (PARTITION BY period ORDER BY bin) AS BIGINT)
      |      AS cum,
      |    CAST(SUM(tcnt) OVER (PARTITION BY period) AS BIGINT) AS n
      |  FROM t
      |), ps AS (SELECT unnest([0.5, 0.9, 0.99]::DOUBLE[]) AS p)
      |SELECT period, p, 0.0 + bin * 5.0 AS quantile_lo, n AS n_rows
      |FROM c CROSS JOIN ps
      |WHERE n > 0 AND cum - tcnt < greatest(1, CAST(ceil(n * p) AS BIGINT))
      |  AND greatest(1, CAST(ceil(n * p) AS BIGINT)) <= cum
      |ORDER BY period, p""".stripMargin) { (s, d) =>
    val ph = Sketches.periodHistograms(Tables.events(s, d),
      expr("unix_micros(ts) div 3600000000"), "value",
      lo = 0.0, hi = 500.0, bins = 100)
    Sketches.rollingQuantiles(ph, Seq(0.5, 0.9, 0.99), periods = 6,
        lo = 0.0, hi = 500.0, bins = 100)
      .orderBy(col("period"), col("p"))
  }

  /** GROUPED trailing quantiles — q171 with a group dimension: "p90 of
    * the last 6 hours, per event_type, for every hour it was active"
    * — the per-entity rolling-percentile monitoring shape, still
    * answered from pre-aggregated (group, period, bin) rows and still
    * fully DuckDB-replayable. Each window adds the group to its
    * partition key, so state stays bounded at that group's
    * periods×bins grid rows. */
  val q172RollingQuantilesByType = QueryDef(
    "q172_rolling_quantiles_by_type",
    """WITH e AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS period,
      |    least(greatest(CAST(floor((value - 0.0) / 5.0) AS BIGINT), 0), 99)
      |      AS bin
      |  FROM events
      |), h AS (
      |  SELECT event_type, period, bin, CAST(count(*) AS BIGINT) AS cnt
      |  FROM e GROUP BY 1, 2, 3
      |), grid AS (
      |  SELECT gp.event_type, gp.period, b.bin,
      |    coalesce(h.cnt, CAST(0 AS BIGINT)) AS cnt
      |  FROM (SELECT DISTINCT event_type, period FROM h) gp
      |  CROSS JOIN (SELECT DISTINCT bin FROM h) b
      |  LEFT JOIN h ON h.event_type = gp.event_type
      |    AND h.period = gp.period AND h.bin = b.bin
      |), t AS (
      |  SELECT event_type, period, bin, cnt,
      |    CAST(SUM(cnt) OVER (PARTITION BY event_type, bin ORDER BY period
      |      RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT) AS tcnt
      |  FROM grid
      |), c AS (
      |  SELECT event_type, period, bin, tcnt,
      |    CAST(SUM(tcnt) OVER (PARTITION BY event_type, period
      |      ORDER BY bin) AS BIGINT) AS cum,
      |    CAST(SUM(tcnt) OVER (PARTITION BY event_type, period) AS BIGINT)
      |      AS n
      |  FROM t
      |), ps AS (SELECT unnest([0.5, 0.9]::DOUBLE[]) AS p)
      |SELECT event_type, period, p, 0.0 + bin * 5.0 AS quantile_lo,
      |  n AS n_rows
      |FROM c CROSS JOIN ps
      |WHERE n > 0 AND cum - tcnt < greatest(1, CAST(ceil(n * p) AS BIGINT))
      |  AND greatest(1, CAST(ceil(n * p) AS BIGINT)) <= cum
      |ORDER BY event_type, period, p""".stripMargin) { (s, d) =>
    val ph = Sketches.periodHistograms(Tables.events(s, d),
      expr("unix_micros(ts) div 3600000000"), "value",
      lo = 0.0, hi = 500.0, bins = 100, groupCols = Seq("event_type"))
    Sketches.rollingQuantiles(ph, Seq(0.5, 0.9), periods = 6,
        lo = 0.0, hi = 500.0, bins = 100, groupCols = Seq("event_type"))
      .orderBy(col("event_type"), col("period"), col("p"))
  }

  /** Round-10: EXACT heavy hitters under bounded-shuffle discovery
    * ([[Sketches.exactHeavyHitters]]) — the hash-oracled exact twin of
    * q92's rows-only `approx_top_k`. Terms above a 1/30 frequency
    * share of the documents token stream: a Misra-Gries
    * TypedImperativeAggregate (≤ k counters per task, map-side
    * combined, no-false-negative guarantee) proposes ≤ k candidates;
    * an exact candidate-only recount + `cnt·k > n` threshold decides.
    * The oracle needs none of that machinery — a plain GROUP BY +
    * HAVING is the same answer, which is exactly the point: the
    * sketch changes the PLAN's shuffle width, not the semantics. */
  val q189HeavyTerms = QueryDef(
    "q189_heavy_terms",
    """WITH toks AS (
      |  SELECT unnest(string_split(text, ' ')) AS term FROM documents
      |), tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM toks)
      |SELECT term, CAST(count(*) AS BIGINT) AS cnt, tot.n_total,
      |       CAST(count(*) AS DOUBLE) / CAST(tot.n_total AS DOUBLE) AS share
      |FROM toks, tot
      |GROUP BY term, tot.n_total
      |HAVING CAST(count(*) AS BIGINT) * 30 > tot.n_total
      |ORDER BY cnt DESC, term""".stripMargin) { (s, d) =>
    Sketches.exactHeavyHitters(
        Tables.documents(s, d).select(explode(split(col("text"), " ")).as("term")),
        "term", k = 30)
      .orderBy(col("cnt").desc, col("term"))
  }

  /** Round-11: per-source OLS drift line ([[Relational.groupedOls]])
    * — is a source's document length trending as ingestion advances?
    * x = the doc's position within its source (doc_id order; POSITION,
    * not raw id, keeps every moment product far inside the exact
    * double envelope at all three verification SFs), y = n_chars.
    * The five moments are exact DECIMAL(38,0) sums (one map-side-
    * combined aggregation), slope/intercept are fixed IEEE trees of
    * their conversions — both hash-replay. */
  val q201OlsDrift = QueryDef(
    "q201_ols_drift",
    """WITH r AS (
      |  SELECT source, n_chars,
      |    CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
      |      AS BIGINT) AS rn
      |  FROM documents),
      |m AS (
      |  SELECT source, CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(CAST(rn AS HUGEINT)) AS HUGEINT) AS sx,
      |    CAST(sum(CAST(n_chars AS HUGEINT)) AS HUGEINT) AS sy,
      |    CAST(sum(CAST(rn AS HUGEINT) * n_chars) AS HUGEINT) AS sxy,
      |    CAST(sum(CAST(rn AS HUGEINT) * rn) AS HUGEINT) AS sxx
      |  FROM r GROUP BY source),
      |s AS (
      |  SELECT source, CAST(n AS BIGINT) AS n_rows,
      |    n * sxy - sx * sy AS num, n * sxx - sx * sx AS den,
      |    sx, sy, n
      |  FROM m)
      |SELECT source, n_rows,
      |  CASE WHEN den = 0 THEN NULL
      |       ELSE CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END AS slope,
      |  CASE WHEN den = 0 THEN NULL
      |       ELSE (CAST(sy AS DOUBLE) -
      |             (CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
      |               * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) END
      |    AS intercept
      |FROM s ORDER BY source""".stripMargin) { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
    val positioned = Tables.documents(s, d)
      .select(col("source"), col("n_chars"), col("doc_id"))
      .withColumn("rn", row_number().over(w).cast("long"))
    Relational.groupedOls(positioned, Seq("source"), "rn", "n_chars")
      .orderBy(col("source"))
  }

  val all: Seq[QueryDef] = Seq(
    q161ExactQuantiles, q162GlobalQuantiles, q163BucketedJoin,
    q164EditDistancePairs, q165ExactOverlap, q170HistSidecarQuantiles,
    q171RollingQuantiles, q172RollingQuantilesByType, q189HeavyTerms,
    q201OlsDrift)
}
