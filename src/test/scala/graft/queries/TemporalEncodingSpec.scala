package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Regression pin for the events.ts encoding contract (round-9 verdict
  * #5): [[graft.sources.Tables.eventsNtz]] dispatches on the parquet
  * FOOTER, so q166 must return byte-identical output whichever of the
  * three contract-legal physical encodings the landing-zone writer
  * shipped — TIMESTAMP_NTZ micros (current testdata), instant-typed
  * TIMESTAMP micros, or the legacy INT64 nanos long. The round-9 fix
  * exists at TemporalQueries' eventsNtz call; this spec cycles the
  * same rows through all three encodings and pins it.
  */
class TemporalEncodingSpec extends SparkSpec {

  test("q166 is identical across all three contract-legal ts encodings") {
    val base = graft.sources.Tables.eventsNtz(spark, sf0001)
    val root = java.nio.file.Files
      .createTempDirectory("ts_encodings").toString

    // 1. TIMESTAMP_NTZ micros — the current testdata encoding, round-
    //    tripped through a fresh write so all three dirs are written
    //    by the same Spark version (isolates ENCODING as the variable)
    base.write.parquet(s"$root/ntz/events.parquet")
    // 2. instant-typed TIMESTAMP micros (isAdjustedToUTC=true): the
    //    UTC session tz makes the NTZ→instant cast value-preserving
    base.withColumn("ts", col("ts").cast(TimestampType))
      .write.parquet(s"$root/instant/events.parquet")
    // 3. legacy INT64 nanos: Spark cannot WRITE a TIMESTAMP(NANOS)
    //    footer, but the reader-side dispatch sees exactly a LongType
    //    column under nanosAsLong — a plain int64 of nanoseconds
    //    exercises the identical normalization branch
    base.withColumn("ts",
        unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      .write.parquet(s"$root/nanos/events.parquet")

    def run(dir: String): Seq[String] =
      SparkEntry.queries("q166_ntz_semantics")(spark, dir)
        .collect().map(_.toString).toSeq

    val ntz = run(s"$root/ntz")
    assert(ntz.nonEmpty)
    assert(run(s"$root/instant") == ntz,
      "instant-typed encoding diverged from NTZ")
    assert(run(s"$root/nanos") == ntz,
      "legacy nanos encoding diverged from NTZ")
  }
}
