package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for q103 (not part of the driver contract). */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warmup
    graft.sources.Tables.documents(spark, d).count()

    val docs = graft.sources.Tables.documents(spark, d)
    // stage 1: inverted-index pair generation (mirrors jaccardDedupClusters)
    val toks = docs.select(col("doc_id").cast("long").as("doc_id"), col("lang"),
      expr("size(split(text, ' ')) DIV 10").as("blk"),
      array_distinct(split(col("text"), " ")).as("ts"))
      .withColumn("n_distinct", size(col("ts")))
    val tok = toks.select(col("doc_id"), col("lang"), col("blk"),
      col("n_distinct"), explode(col("ts")).as("token"))
    val a = tok.select(col("doc_id").as("src"), col("lang"), col("blk"),
      col("n_distinct").as("na"), col("token"))
    val b = tok.select(col("doc_id").as("dst"), col("lang"), col("blk"),
      col("n_distinct").as("nb"), col("token"))
    val pairs = a.join(b, Seq("lang", "blk", "token"))
      .where(col("src") < col("dst"))
      .groupBy(col("src"), col("dst"), col("na"), col("nb"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared").cast("double") /
        (col("na") + col("nb") - col("shared")) >= 0.7)
      .select("src", "dst")
    val e = time("edges (explode-join)")(pairs.localCheckpoint(true))
    println("[profile] n_edges=" + e.count())

    // variant b: blocked pairwise join over xxhash64'd token arrays
    val htoks = docs.select(col("doc_id").cast("long").as("doc_id"), col("lang"),
      expr("size(split(text, ' ')) DIV 10").as("blk"),
      transform(array_distinct(split(col("text"), " ")), t => xxhash64(t)).as("hs"))
    val ha = htoks.select(col("doc_id").as("src"), col("lang"), col("blk"),
      col("hs").as("hs_a"))
    val hb = htoks.select(col("doc_id").as("dst"), col("lang"), col("blk"),
      col("hs").as("hs_b"))
    val hpairs = ha.join(hb, Seq("lang", "blk"))
      .where(col("src") < col("dst"))
      .withColumn("shared", size(array_intersect(col("hs_a"), col("hs_b"))))
      .where(col("shared").cast("double") /
        (size(col("hs_a")) + size(col("hs_b")) - col("shared")) >= 0.7)
      .select("src", "dst")
    val e2 = time("edges (hashed pairwise)")(hpairs.localCheckpoint(true))
    println("[profile] n_edges2=" + e2.count())
    val cc = time("cc after edges")(
      graft.ops.Clustering.connectedComponents(e, "src", "dst",
        nodes = Some(docs.select(col("doc_id").cast("long").as("src")))))
    println("[profile] rows=" + cc.count())
    val cc2 = time("jaccardDedupClusters warm")(
      graft.ops.Clustering.jaccardDedupClusters(docs))
    println("[profile] rows2=" + cc2.count())
    spark.stop()
  }
}
