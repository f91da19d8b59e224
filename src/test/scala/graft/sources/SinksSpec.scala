package graft.sources

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SinksSpec extends SparkSpec {

  test("ingestCsvBytes persists uploaded bytes and re-scans them (S3)") {
    val bytes = Files.readAllBytes(
      java.nio.file.Paths.get(Tables.LoanCsvPath))
    val dest = Files.createTempDirectory("ingest").resolve("upload.csv")
    val df = Sinks.ingestCsvBytes(spark, bytes, dest.toString)
    assert(df.count() === 999)
    assert(df.schema === Tables.loanSchema)
  }

  test("partitioned write prunes directories on partition-column filters") {
    val dir = Files.createTempDirectory("events_part").toString + "/events"
    Sinks.writePartitioned(
      Tables.events(spark, sf0001).withColumn("ts", col("ts").cast("string")),
      dir, "event_type")
    // one subdirectory per event_type
    val subdirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("event_type=")).map(_.getName).sorted
    assert(subdirs.length === 5)

    val back = spark.read.parquet(dir).filter(col("event_type") === "click")
    val planStr = back.queryExecution.executedPlan.toString
    // the click filter must appear as a partition filter, not a data filter
    assert(planStr.contains("PartitionFilters") &&
      planStr.contains("event_type"), planStr.take(500))
    assert(back.count() ===
      Tables.events(spark, sf0001).filter(col("event_type") === "click").count())
  }

  test("JSON and ORC roundtrips preserve rows and values") {
    val base = Tables.customer(spark, sf0001)
    val jdir = Files.createTempDirectory("json_rt").toString + "/c"
    val odir = Files.createTempDirectory("orc_rt").toString + "/c"
    Sinks.writeJson(base, jdir)
    Sinks.writeOrc(base, odir)
    val viaJson = Sinks.readJson(spark, jdir, base.schema)
    val viaOrc = spark.read.orc(odir)
    assert(viaJson.count() === base.count())
    assert(viaOrc.count() === base.count())
    assert(viaJson.except(base).count() === 0)
    assert(viaOrc.except(base).count() === 0)
    // ORC scans push filters like parquet
    val plan = viaOrc.filter(col("c_custkey") === 7L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("c_custkey"))
  }

  test("zstd parquet is smaller than snappy, reads back identically") {
    val df = Tables.lineitem(spark, sf0001)
    val snappy = java.nio.file.Files.createTempDirectory("pq_snappy").toString
    val zstd = java.nio.file.Files.createTempDirectory("pq_zstd").toString
    Sinks.writeParquet(df, snappy)
    Sinks.writeParquet(df, zstd, codec = "zstd")
    def bytes(dir: String) = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    assert(bytes(zstd) < bytes(snappy),
      s"zstd ${bytes(zstd)} !< snappy ${bytes(snappy)}")
    assert(spark.read.parquet(zstd).count() === df.count())
  }

  test("maxRecordsPerFile splits oversized output files") {
    val dir = java.nio.file.Files.createTempDirectory("pq_sized").toString
    Sinks.writeParquetSized(
      Tables.orders(spark, sf0001).coalesce(1), dir, maxRecordsPerFile = 400)
    val files = new java.io.File(dir).listFiles
      .count(_.getName.endsWith(".parquet"))
    // 1500 orders / 400 per file -> 4 files despite the single partition
    assert(files === 4, s"got $files files")
  }

  test("modifiedAfter reads only newly-landed files (incremental ingestion)") {
    val land = java.nio.file.Files.createTempDirectory("landing").toString
    Tables.region(spark, sf0001).write.parquet(s"$land/batch1")
    val t1 = java.time.LocalDateTime.now().plusSeconds(2)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss"))
    Thread.sleep(3000)
    Tables.nation(spark, sf0001).select(col("n_nationkey").as("r_regionkey"),
      col("n_name").as("r_name")).write.parquet(s"$land/batch2")
    val incremental = Sinks.readParquetModifiedAfter(
      spark, s"$land/batch*", t1)
    assert(incremental.count() === 25) // only batch2's nation-shaped rows
    assert(spark.read.parquet(s"$land/batch*").count() === 5 + 25)
  }

  test("compactParquetDir auto-recovers a crash-stranded backup instead of deleting it") {
    val dir = Files.createTempDirectory("compact_rec").toString + "/side"
    val df = Tables.region(spark, sf0001)
    df.write.parquet(dir)
    val expected = spark.read.parquet(dir).count()
    // simulate a crash between rename(path -> bak) and rename(tmp -> path):
    // the live dir is gone, bak holds the only copy
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "__compact_bak")))
    // the natural retry must restore the backup and compact it -- the
    // pre-fix behavior deleted bak first (permanent data loss)
    Sinks.compactParquetDir(spark, dir)
    assert(spark.read.parquet(dir).count() === expected)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + "__compact_bak")))
  }

  test("compactParquetDir refuses to run when neither dir nor backup exists") {
    val dir = Files.createTempDirectory("compact_none").toString + "/missing"
    val e = intercept[IllegalArgumentException] {
      Sinks.compactParquetDir(spark, dir)
    }
    assert(e.getMessage.contains("refusing"))
  }

  test("auditParquetDir: counts data files and bytes; compaction drives the " +
      "file count to one") {
    val dir = Files.createTempDirectory("audit").toString + "/side"
    (0 until 3).foreach { i =>
      Tables.region(spark, sf0001).write.mode("append").parquet(dir)
    }
    val before = Sinks.auditParquetDir(spark, dir).collect()(0)
    assert(before.getAs[Long]("file_count") >= 3)
    assert(before.getAs[Long]("total_bytes") > 0)
    assert(before.getAs[Long]("min_file_bytes") <=
      before.getAs[Long]("max_file_bytes"))
    Sinks.compactParquetDir(spark, dir)
    val after = Sinks.auditParquetDir(spark, dir).collect()(0)
    assert(after.getAs[Long]("file_count") === 1L)
  }

  test("withDirLock: a second concurrent writer fails loud with the holder's identity") {
    val dir = Files.createTempDirectory("lock").toString + "/side"
    Sinks.withDirLock(spark, dir, "outer") {
      val e = intercept[IllegalStateException] {
        Sinks.withDirLock(spark, dir, "inner") { fail("must not run") }
      }
      assert(e.getMessage.contains("locked by another writer"))
      assert(e.getMessage.contains("outer@"))
    }
    // released on completion: a later writer proceeds
    assert(Sinks.withDirLock(spark, dir, "later") { 42 } === 42)
  }

  test("withDirLock: released when the body throws; stale markers clear via breakDirLock") {
    val dir = Files.createTempDirectory("lock2").toString + "/side"
    intercept[RuntimeException] {
      Sinks.withDirLock(spark, dir, "failing") { throw new RuntimeException("boom") }
    }
    // body failure released the lock (replays are idempotent per appender)
    Sinks.withDirLock(spark, dir, "retry") { () }
    // a hard-crash marker (simulated by creating the file) blocks until broken
    val lock = new org.apache.hadoop.fs.Path(dir + ".lock")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(lock, false).close()
    intercept[IllegalStateException] {
      Sinks.withDirLock(spark, dir, "blocked") { () }
    }
    assert(Sinks.breakDirLock(spark, dir))
    Sinks.withDirLock(spark, dir, "after-break") { () }
  }

  test("bucketed tables co-locate and drop the join exchange") {
    val o = Tables.orders(spark, sf0001)
    Sinks.writeBucketed(o, "orders_bucketed", "o_custkey", buckets = 4)
    val t = spark.table("orders_bucketed")
    val agg = t.groupBy(col("o_custkey")).agg(sum(col("o_totalprice")))
    // bucketed layout satisfies the aggregation's distribution: no Exchange
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(o_custkey"), plan.take(800))
    assert(agg.count() === o.select("o_custkey").distinct().count())
  }
}
