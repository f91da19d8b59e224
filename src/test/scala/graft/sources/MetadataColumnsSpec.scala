package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Provenance columns: at 100 TB every record needs to know which
  * file it came from (sample-level lineage for dataset debugging and
  * takedown requests). Parquet scans expose this for free via the
  * hidden `_metadata` struct — no extra scan, no UDF. */
class MetadataColumnsSpec extends SparkSpec {

  test("_metadata file provenance rides the scan") {
    val df = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"),
        col("_metadata.file_name").as("src_file"),
        col("_metadata.file_size").as("src_size"))
    val rows = df.limit(5).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(1) == "orders.parquet"))
    assert(rows.forall(_.getLong(2) > 0))
  }

  test("row_index + file_path give a stable per-record provenance key") {
    val keys = Tables.region(spark, sf0001)
      .select(col("_metadata.file_path"), col("_metadata.row_index"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(keys.distinct.length == keys.length, "provenance keys must be unique")
  }

  test("provenanceId: unique, shuffle-free, reproducible across runs") {
    import graft.ops.Relational.provenanceId
    val df = provenanceId(Tables.customer(spark, sf0001))
    val ids = df.select("provenance_id").collect().map(_.getLong(0))
    assert(ids.distinct.length === ids.length)
    val again = provenanceId(Tables.customer(spark, sf0001))
      .select("provenance_id").collect().map(_.getLong(0))
    assert(ids.sorted.sameElements(again.sorted), "must be run-stable")
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
      "id assignment must not shuffle")
  }
}
