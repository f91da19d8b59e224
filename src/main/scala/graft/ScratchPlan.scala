package graft

/** Throwaway plan/wall dumper for optimization-round investigation
  * (not part of the driver contract; deleted before round end). */
object ScratchPlan {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.withJoinStrategy(
      org.apache.spark.sql.SparkSession.builder()
        .master("local[32]").config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[wall] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // warm up codegen/scan
    time("warmup")(SparkEntry.entry(spark).count())
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val withTs = docs.select(col("doc_id"), col("text"),
      graft.ops.TextAnalysis.tokens(col("text")).as("__ts"))
    val repCols = docs.select(col("doc_id") +:
      graft.ops.Curation.repetitionSignalCols(col("text")): _*)
    for (i <- 1 to 2) {
      time(s"scan-only-$i")(noop(docs.select(col("doc_id"), col("text"))))
      time(s"tokens-$i")(noop(withTs.select(col("doc_id"), size(col("__ts")).as("n"))))
      time(s"repcols-$i")(noop(repCols))
      time(s"stopword-$i")(noop(docs.select(col("doc_id"),
        graft.ops.TextAnalysis.stopwordCount(col("text")).as("sc"))))
      val full = graft.queries.CurationQueries.probeScaledLazy(spark, sf)
      time(s"probeScaledLazy-$i")(noop(full))
    }
    spark.stop()
  }
}
