package graft.queries

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Round-8 temporal-semantics block.
  *
  * Round 7's breakage class was a TIMESTAMP_NTZ storage drift that no
  * query exercised: every events query normalized `ts` to an instant
  * before touching it, so naive-timestamp semantics (comparison,
  * windows, truncation on the wall-clock value as stored) had zero
  * oracle coverage. q166 pins that class: it reads `events.ts` AS
  * TIMESTAMP_NTZ — no cast, no normalization — and runs literal
  * comparison, lag ordering, and hour truncation on the naive value,
  * exactly what DuckDB's naive TIMESTAMP does. If a future Spark or
  * writer change shifts NTZ semantics (session-timezone leakage into
  * the naive value being the classic bug), this query hash-diverges
  * immediately instead of silently.
  */
object TemporalQueries {

  /** Naive-timestamp (TIMESTAMP_NTZ) semantics, end to end: filter by
    * an NTZ literal, per-user lag over NTZ ordering, hourly
    * date_trunc on the NTZ wall clock. Output encodes timestamps as
    * VARCHAR (whole hours) / epoch micros (raw instants) per the
    * oracle hashing conventions; the epoch conversion casts NTZ→UTC
    * instant only in the final projection (session tz is pinned UTC,
    * so the stored microsecond value is preserved bit-exactly —
    * [[graft.sources.Tables.events]] documents the same contract). */
  val q166NtzSemantics = QueryDef(
    "q166_ntz_semantics",
    """WITH l AS (
      |  SELECT user_id, ts, event_id,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev_ts
      |  FROM events
      |), f AS (
      |  SELECT * FROM l WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
      |)
      |SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(max(epoch_us(ts)) AS BIGINT) AS last_ts_us,
      |  CAST(coalesce(sum(epoch_us(ts) - epoch_us(prev_ts)), 0) AS BIGINT)
      |    AS sum_gap_us
      |FROM f GROUP BY 1 ORDER BY hour""".stripMargin) { (s, d) =>
    // NTZ-normalized scan: ts is TIMESTAMP_NTZ throughout the
    // filter/window/group — the whole point of the query. eventsNtz
    // dispatches on the footer, so any contract-legal encoding
    // (NTZ, instant, legacy nanos) lands on the same naive value
    // instead of an opaque analysis error (round-9 ADVICE).
    val raw = Tables.eventsNtz(s, d)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val us = (c: org.apache.spark.sql.Column) =>
      unix_micros(c.cast(TimestampType))
    raw
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .filter(col("ts") >= lit("2024-01-02 00:00:00").cast(TimestampNTZType))
      .groupBy(date_trunc("hour", col("ts")).cast("string").as("hour"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        max(us(col("ts"))).as("last_ts_us"),
        coalesce(sum(us(col("ts")) - us(col("prev_ts"))), lit(0L))
          .as("sum_gap_us"))
      .orderBy(col("hour"))
  }

  val all: Seq[QueryDef] = Seq(q166NtzSemantics)
}
