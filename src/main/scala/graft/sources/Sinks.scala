package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Output paths of the engine (SURVEY.md §2.1 sinks + the layouts a
  * 100 TB deployment actually needs):
  *
  *  - raw byte ingestion (S3: the reference persists an uploaded file
  *    then re-scans it, app.py:43-45);
  *  - plain / partitioned parquet — `partitionBy` gives directory
  *    partition pruning on read (filters on the partition column never
  *    touch non-matching files);
  *  - bucketed tables — `bucketBy` on a join key pre-shuffles data at
  *    write time so later equi-joins/aggregations on that key skip the
  *    exchange entirely (co-located join).
  */
object Sinks {

  /** S3 parity: persist received bytes, then scan through the normal
    * reader — upload-then-query. */
  def ingestCsvBytes(spark: SparkSession, bytes: Array[Byte],
                     destPath: String): DataFrame = {
    java.nio.file.Files.write(java.nio.file.Paths.get(destPath), bytes)
    Tables.loan(spark, destPath)
  }

  /** Plain parquet sink. `codec` matters at scale: zstd trades ~10%
    * write CPU for ~30% smaller files than snappy — at 100 TB that is
    * 30 TB less scan I/O on every downstream read. */
  def writeParquet(df: DataFrame, path: String,
                   codec: String = "snappy"): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("compression", codec)
      .parquet(path)

  /** Size-bounded parquet sink: caps rows per output file so a
    * skewed final partition can't emit one giant file (file-level
    * parallelism on read = number of files for non-splittable work). */
  def writeParquetSized(df: DataFrame, path: String,
                        maxRecordsPerFile: Long): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)

  /** Incremental batch ingestion: read only files modified after the
    * given timestamp — the poor-man's CDC for landing zones written by
    * an external producer (the streaming file source is the
    * continuous twin). Timestamp format: yyyy-MM-dd'T'HH:mm:ss. */
  def readParquetModifiedAfter(spark: SparkSession, path: String,
                               modifiedAfter: String): DataFrame =
    spark.read.option("modifiedAfter", modifiedAfter).parquet(path)

  /** Hive-style partitioned parquet: one directory per distinct value
    * of `partitionCol`. Read-side filters on that column prune whole
    * directories (PartitionFilters in explain). Choose low-cardinality
    * columns; high-cardinality partitioning creates a small-file
    * explosion at scale. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(path)

  /** JSON-lines sink/source (interchange format; schema supplied on
    * read — never inferred in production paths). */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJson(spark: SparkSession, path: String,
               schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC sink (second columnar format; same pushdown/pruning story as
    * parquet). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Bucketed + sorted managed table: `buckets` files per partition,
    * rows routed by hash(bucketCol). Joins/groupBys on bucketCol
    * between tables bucketed the same way need no shuffle. Requires
    * saveAsTable (bucket metadata lives in the catalog). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int = 8): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
}
