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

  /** Layout audit of a parquet directory — the operational pre-check
    * that decides a [[compactParquetDir]] run: recursive data-file
    * count and byte sizes (min/avg/max). At scale the small-files tax
    * is one object-store request per file on EVERY read, so the ratio
    * file_count / (total_bytes / target_file_bytes) is the compaction
    * signal. One driver-side listing (bounded by file count — the same
    * class as the appenders' own commit listings); returns a 1-row
    * DataFrame. */
  def auditParquetDir(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(path, true)
    var n = 0L; var bytes = 0L
    var min = Long.MaxValue; var max = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && !name.startsWith("_") && !name.startsWith(".")) {
        n += 1; bytes += f.getLen
        if (f.getLen < min) min = f.getLen
        if (f.getLen > max) max = f.getLen
      }
    }
    Seq((n, bytes, if (n == 0) 0L else min, max,
      if (n == 0) 0.0 else bytes.toDouble / n))
      .toDF("file_count", "total_bytes", "min_file_bytes", "max_file_bytes",
        "avg_file_bytes")
  }

  /** Single-writer ENFORCEMENT for append-maintained directories (the
    * dedup fingerprint/minhash sidecars, sketch sidecars, IVF index,
    * compaction): every appender documents a single-writer contract;
    * this turns it from documentation into a deterministic failure.
    *
    * Protocol: atomically create `<dir>.lock` (Hadoop
    * `create(overwrite = false)` — atomic on HDFS and object stores
    * with conditional puts) holding the writer's identity; run the
    * body; remove the marker. A SECOND writer — concurrent, or
    * retrying after a crash that left a stale marker — fails loud with
    * the holder's identity instead of silently double-admitting (the
    * failure mode of an unprotected sidecar: two concurrent ingests
    * both pass the anti-join, both append). The body's OWN failure
    * releases the lock (replays are already idempotent per each
    * appender's contract); only a hard crash leaves the marker, which
    * is exactly the torn-append case a human should inspect before
    * clearing with [[breakDirLock]]. */
  def withDirLock[T](spark: SparkSession, dir: String, op: String)
      (body: => T): T = {
    val lock = new org.apache.hadoop.fs.Path(dir + ".lock")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (lock.getParent != null) fs.mkdirs(lock.getParent)
    val out =
      try fs.create(lock, false)
      catch {
        case e: java.io.IOException =>
          val holder =
            try {
              val in = fs.open(lock)
              try scala.io.Source.fromInputStream(in).mkString
              finally in.close()
            } catch { case _: java.io.IOException => "<unreadable>" }
          throw new IllegalStateException(
            s"$op: $dir is locked by another writer [$holder]. " +
              "Append-maintained dirs are single-writer; if the holder " +
              "crashed mid-append, inspect the dir for a torn append, " +
              "then clear the marker with Sinks.breakDirLock.", e)
      }
    // once the marker exists, EVERY exit path below must release it —
    // including a failure writing the holder identity itself
    try {
      try {
        out.write((s"$op@${java.net.InetAddress.getLocalHost.getHostName}" +
          s":pid${ProcessHandle.current().pid()}")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      } finally out.close()
      body
    } finally { fs.delete(lock, false); () }
  }

  /** Recursive listing of a dir's DATA files for the driver-side
    * parquet readers (ADVICE r18): skips any file whose path relative
    * to `dir` contains a component starting with '_' or '.' — the
    * same filter Spark's InMemoryFileIndex/HadoopFSUtils apply at
    * every level. Filtering only the LEAF name is not enough: a
    * crashed Spark append leaves task files under
    * `_temporary/<attempt>/...` whose leaf names look like ordinary
    * parts, and a torn attempt file would make every footer/page read
    * throw (or, worse, an orphaned task-committed file would silently
    * double-count) until an operator hand-cleaned the dir. */
  private[graft] def listDataFiles(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path)
      : Seq[org.apache.hadoop.fs.LocatedFileStatus] = {
    val base = fs.makeQualified(dir)
    def hiddenUnderBase(p: org.apache.hadoop.fs.Path): Boolean = {
      var cur = p
      while (cur != null && cur != base) {
        val n = cur.getName
        if (n.startsWith("_") || n.startsWith(".")) return true
        cur = cur.getParent
      }
      false
    }
    val out = scala.collection.mutable.ArrayBuffer[
      org.apache.hadoop.fs.LocatedFileStatus]()
    val it = fs.listFiles(base, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getLen > 0 &&
          !hiddenUnderBase(fs.makeQualified(f.getPath))) out += f
    }
    out.toSeq
  }

  /** Guard for BATCH-TAGGED sidecars (round 16): a sidecar is tagged
    * with a `batch_id` column from its FIRST append or never. Mixing
    * tagged and untagged appends in one directory is the silent
    * failure this check turns loud: parquet readers infer the schema
    * from a sample of files, so a mixed dir can drop the `batch_id`
    * column on read — and with it every replay-exclusion and
    * duplicate-append defense the tag exists for. One footer read per
    * append (the appenders already pay a listing for the dir lock),
    * done DRIVER-SIDE with the parquet footer API (optimization round
    * 18): `spark.read.parquet(dir).schema` spins up a parallel
    * schema-inference job for the same one bit, and under this
    * guard's own invariant every file in the dir agrees, so one
    * footer is exact. */
  private[graft] def assertBatchTagConsistent(spark: SparkSession,
      dir: String, tagged: Boolean, op: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = path.getFileSystem(conf)
    if (!fs.exists(path)) return
    val dataFile = listDataFiles(fs, path).headOption
      .map(_.getPath).orNull
    // dir exists but holds no data file (e.g. only a _SUCCESS
    // marker) — the next append defines the schema
    if (dataFile == null) return
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        dataFile, conf))
    val existingTagged =
      try reader.getFooter.getFileMetaData.getSchema
        .containsField("batch_id")
      finally reader.close()
    require(existingTagged == tagged,
      s"$op: $dir is ${if (existingTagged) "batch-tagged" else "untagged"} " +
        s"but this append is ${if (tagged) "tagged" else "untagged"} — " +
        "a sidecar carries batch_id from its first append or never " +
        "(mixed parquet schemas can silently drop the tag on read)")
  }

  /** Clear a stale writer marker left by a crashed appender — call
    * only after verifying the directory's last append isn't torn (each
    * appender's scaladoc states its crash ordering and the recoverable
    * direction). */
  def breakDirLock(spark: SparkSession, dir: String): Boolean = {
    val lock = new org.apache.hadoop.fs.Path(dir + ".lock")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(lock, false)
  }

  /** Wipe an index/sidecar directory AND its writer-lock marker ahead
    * of a from-scratch rebuild — the single shared wipe for every
    * bench/query harness that rebuilds a locked dir per run (round-10
    * ADVICE: the harnesses each hand-rolled this, and the ones that
    * deleted only the dir left a crashed prior build's stale lock
    * permanently failing the rebuild with "locked by another writer").
    * Deleting the lock is the deliberate harness semantic: these dirs
    * are single-tenant per bench process, so a surviving lock is by
    * definition stale, never a live writer. `extra` names sibling
    * artifacts keyed off the same dir (e.g. the `.bloom` twin of a
    * fingerprint sidecar). */
  def wipeForRebuild(spark: SparkSession, dir: String,
                     extra: String*): Unit = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(path, true)
    fs.delete(new org.apache.hadoop.fs.Path(dir + ".lock"), false)
    extra.foreach(e => fs.delete(new org.apache.hadoop.fs.Path(e), true))
  }

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
                        sortCol: Option[String] = None,
                        transform: Option[DataFrame => DataFrame] = None)
      : Unit = withDirLock(spark, dir, "compactParquetDir") {
    import org.apache.spark.sql.functions.col
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(dir + "__compact_tmp")
    val bak = new org.apache.hadoop.fs.Path(dir + "__compact_bak")
    // crash recovery BEFORE the cleanup deletes: a prior run that died
    // between rename(path → bak) and rename(tmp → path) leaves the live
    // dir missing while bak/tmp hold the only copies — deleting them
    // here would be permanent data loss on the natural retry. Restore
    // the backup first; only then is clearing leftovers safe.
    if (!fs.exists(path)) {
      require(fs.exists(bak),
        s"compactParquetDir: $dir does not exist and no backup at $bak — " +
          "refusing to compact a missing directory")
      require(fs.rename(bak, path),
        s"compactParquetDir: could not restore backup $bak to $dir")
    }
    fs.delete(tmp, true); fs.delete(bak, true)
    val df = transform.foldLeft(spark.read.parquet(dir))((d, f) => f(d))
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
