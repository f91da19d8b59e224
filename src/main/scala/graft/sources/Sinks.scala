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

  /** Compact an append-accumulated parquet directory. Append-based
    * operators (the dedup fingerprint sidecar, IVF index appends) add
    * one file set per ingest; at 100 TB the small-files tax — one
    * object-store request per file on EVERY read — eventually
    * outweighs the reads the layout serves, and compaction is the
    * standard periodic fix.
    *
    * Rewrite: partitioned dirs are repartitioned ON the partition
    * columns, so each output directory is written by exactly one task
    * (one file per directory); unpartitioned dirs coalesce to
    * `coalesceTo` files, optionally sorted within partitions (row-group
    * min/max stats for later pruning). The swap is
    * write-tmp → rename-away → rename-in → drop-backup, so a crash at
    * any point leaves either the original or a complete backup
    * (`<dir>__compact_bak`) on disk to restore by hand — never a
    * half-written live dir. Same single-writer contract as the
    * appenders; readers must not hold the dir open across the swap. */
  def compactParquetDir(spark: SparkSession, dir: String,
                        partitionCols: Seq[String] = Nil,
                        coalesceTo: Int = 1,
                        sortCol: Option[String] = None): Unit = {
    import org.apache.spark.sql.functions.col
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(dir + "__compact_tmp")
    val bak = new org.apache.hadoop.fs.Path(dir + "__compact_bak")
    fs.delete(tmp, true); fs.delete(bak, true)
    val df = spark.read.parquet(dir)
    val shaped =
      if (partitionCols.nonEmpty) df.repartition(partitionCols.map(col): _*)
      else sortCol.foldLeft(df.coalesce(coalesceTo))(
        (d, c) => d.sortWithinPartitions(col(c)))
    val writer = shaped.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
     else writer).parquet(tmp.toString)
    require(fs.rename(path, bak), s"could not stage backup for $dir")
    require(fs.rename(tmp, path), s"could not swap compacted dir into $dir " +
      s"(original preserved at $bak)")
    fs.delete(bak, true)
    ()
  }
}
