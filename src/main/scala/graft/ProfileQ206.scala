package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch profiler for q206_pagerank_sidecar (not part of the driver
  * contract) — the round-14 verdict's #3 ask: the 10× map's most
  * expensive entry (36.4 s, ×4.38) needs a per-stage cost attribution
  * like every other expensive entry has. Decomposes the query into its
  * physical stages and times each at sf0.1 and at the 10× blow-up
  * (`target/tmp/scalebench_x10`, left behind by ScaleBench):
  *
  *  1. pair derivation + 4 sidecar writes (incl. the deliberate
  *     duplicate batch)  — each write is a distinct + parquet append
  *  2. compaction         — distinct-collapse + src sort + swap
  *  3. PageRank setup     — edge distinct/repartition/checkpoint + deg
  *  4. PageRank iters 1..5 — cumulative walls, so marginal cost per
  *     iteration = t(k) − t(k−1)
  *  5. final top-10 window
  *
  * Run: SPARK_GRAFT_Q206_DIRS=/root/testdata/sf0.1,target/tmp/scalebench_x10 \
  *        sbt "runMain graft.ProfileQ206"
  */
object ProfileQ206 {
  def main(args: Array[String]): Unit = {
    val dirs = sys.env.getOrElse("SPARK_GRAFT_Q206_DIRS",
      "/root/testdata/sf0.1,target/tmp/scalebench_x10").split(",").toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q206] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val Off = 10000000L

    for (d <- dirs) {
      println(s"[q206] === $d ===")
      // warmup (JIT + page cache for the input)
      graft.sources.Tables.lineitem(spark, d).count()
      val sidecar = s"target/tmp/profile_q206_${d.replaceAll("[^A-Za-z0-9.]", "_")}"
      graft.sources.Sinks.wipeForRebuild(spark, sidecar)
      val pairs = graft.sources.Tables.lineitem(spark, d)
        .select("l_orderkey", "l_suppkey")
        .join(graft.sources.Tables.orders(spark, d)
          .select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey").as("ok"),
          col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
      def batch(i: Int) = {
        val p = pairs.filter(col("ok") % 3 === i)
        p.select(col("cust").as("src"), (col("supp") + Off).as("dst"))
          .unionByName(
            p.select((col("supp") + Off).as("src"), col("cust").as("dst")))
      }
      time("stage1 total: 4 sidecar writes") {
        time("  write batch0")(
          graft.ops.Graph.writeEdgeSidecar(batch(0), "src", "dst", sidecar))
        time("  write batch1")(
          graft.ops.Graph.writeEdgeSidecar(batch(1), "src", "dst", sidecar))
        time("  write batch2")(
          graft.ops.Graph.writeEdgeSidecar(batch(2), "src", "dst", sidecar))
        time("  write batch0 again (dup)")(
          graft.ops.Graph.writeEdgeSidecar(batch(0), "src", "dst", sidecar))
      }
      time("stage2: compaction")(
        graft.ops.Graph.compactEdgeSidecar(spark, sidecar))
      println("[q206] edges=" + spark.read.parquet(sidecar).count() +
        " files_bytes=" + new java.io.File(sidecar).listFiles()
          .filter(_.getName.endsWith(".parquet")).map(_.length()).sum)
      // stage 3+4: cumulative PageRank walls at iters=1..5; each run
      // includes the setup (edge checkpoint + deg), so t(1) ≈ setup +
      // one iteration and t(k) − t(k−1) ≈ the marginal iteration cost
      var prev = 0.0
      for (k <- 1 to 5) {
        val t0 = System.nanoTime()
        graft.ops.Graph.pageRankFromEdgeSidecar(spark, sidecar, iters = k)
          .count()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[q206] stage3+4: pagerank iters=$k cumulative $t%.2f s " +
          f"(marginal ${t - prev}%.2f s)")
        prev = t
      }
      // the compacted fast path: skip the reader's defensive distinct
      // (the sidecar was just compacted — already a set)
      time("stage3+4 compacted=true: pagerank iters=5, distinct skipped")(
        graft.ops.Graph.pageRankFromEdgeSidecar(spark, sidecar, iters = 5,
          compacted = true).count())
      val pr = graft.ops.Graph.pageRankFromEdgeSidecar(spark, sidecar, iters = 5)
        .localCheckpoint(true)
      pr.count()
      time("stage5: top-10 window over materialized ranks") {
        val w = Window.partitionBy("kind")
          .orderBy(col("rank_fp").desc, col("node"))
        pr.select(
            when(col("node") >= Off, lit("supp")).otherwise(lit("cust"))
              .as("kind"),
            when(col("node") >= Off, col("node") - Off).otherwise(col("node"))
              .as("node_key"),
            col("rank_fp"), col("degree"), col("node"))
          .withColumn("rnk", row_number().over(w))
          .where(col("rnk") <= 10).count()
      }
    }
    spark.stop()
  }
}
