package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-shot deep-shard harness for the incremental curation pipeline
  * (round 15 — the [[KCoreDeepRun]] discipline applied to q221): the
  * registry's q221 certifies shard-by-shard ≡ one-shot at THREE
  * shards and never compacts mid-stream; the operational regime a
  * 100 TB corpus actually runs is MANY shards arriving over weeks
  * with sidecar compaction on a cadence. This main blows the corpus
  * up `SPARK_GRAFT_SCALE_COPIES`× (the [[ScaleBench]] construction —
  * 10×-duplicated, deliberately adversarial for the dedup stages),
  * splits it into `SPARK_GRAFT_INCR_SHARDS` monotone doc_id shards,
  * ingests them one at a time through
  * [[graft.ops.CurationPipeline.ingestShard]] — compacting the
  * digest / chunk-key / Gram sidecars every
  * `SPARK_GRAFT_INCR_COMPACT_EVERY` shards, the cadence q221 never
  * exercises — finalizes once, and asserts the result digest equals
  * the one-shot q218 plan over the same blown corpus.
  *
  * What only this depth can expose (and q221's three shards cannot):
  *  - per-shard ingest wall as the accumulated sidecars grow — the
  *    100 TB property is "shard K's cost ∝ shard size + sidecar
  *    probe", so the wall-vs-K series is the measured claim, not a
  *    scaladoc one;
  *  - mid-stream compaction being semantics-free across every
  *    sidecar family at once (each compactor is unit-proven
  *    idempotent, but q221 never interleaves them with ingests);
  *  - keep-first-arrived ≡ keep-min-id and the frozen-registry rule
  *    under 10×-duplication, where EVERY shard re-offers documents
  *    that shards before it already admitted.
  *
  * Not part of the query registry: measurement harness, not an
  * operator. Prints one JSON line for the round artifact. */
object IncrementalDeepRun {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    val shards = sys.env.getOrElse("SPARK_GRAFT_INCR_SHARDS", "16").toInt
    val compactEvery =
      sys.env.getOrElse("SPARK_GRAFT_INCR_COMPACT_EVERY", "4").toInt
    require(shards >= 2 && compactEvery >= 1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.getOrCreate(s"local[$cpus]")
    spark.sparkContext.setLogLevel("WARN")

    import graft.ops.CurationPipeline
    import graft.sources.Tables

    // Documents-only blow-up with a 19-DIVISIBLE id stride (2^33
    // rounded up to the next multiple of 19): q218's holdout rule is
    // `doc_id % 19 = 0`, and the generic ScaleBench stride (2^33 ≡ 12
    // mod 19) re-rolls holdout membership per copy — the frozen
    // eval-gram registry then unions 10 DIFFERENT holdout samples and
    // decontam at the synthetic-vocabulary threshold drops ~the whole
    // corpus (a degenerate 1-row run, observed). A multiple-of-19
    // stride keeps every copy's holdout set the verbatim base one, so
    // the registry — and the pipeline's selectivity — match the base
    // corpus while the dedup stages still face full 10× duplication.
    val stride = ((1L << 33) / 19 + 1) * 19
    val blownDir = s"target/tmp/incrdeep_docs_x$copies"
    if (!sys.env.get("SPARK_GRAFT_SCALE_REUSE").contains("1") ||
        !new java.io.File(s"$blownDir/documents.parquet").exists()) {
      val base = spark.read.parquet(s"$sfDir/documents.parquet")
      (0 until copies).map(i => base.withColumn("doc_id",
          col("doc_id") + lit(i * stride)))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$blownDir/documents.parquet")
    }

    def digestOf(df: DataFrame): (Long, Long) = {
      val cols = df.columns.map(c => col(c).cast("string"))
      val row = df.agg(
        sum(crc32(concat_ws("|", cols: _*))).as("digest"),
        count(lit(1)).as("n")).collect()(0)
      (row.getLong(0), row.getLong(1))
    }

    // ---- one-shot side: the registered q218 plan over the blown dir
    val t0 = System.nanoTime()
    val (dOne, nOne) = digestOf(
      SparkEntry.queries("q218_curation_pipeline")(spark, blownDir))
    val oneShotSec = (System.nanoTime() - t0) / 1e9

    // ---- incremental side: N monotone shards + cadenced compaction
    val dirs = CurationPipeline.Dirs(s"target/tmp/incrdeep_x$copies")
    val docs = Tables.documents(spark, blownDir)
    val holdout = col("doc_id") % 19 === 0
    CurationPipeline.init(spark, dirs, docs.filter(holdout))
    // the upstream feature pipeline runs once over the full corpus
    // (corpus-relative signals are its job — the writeGramSidecar
    // contract q218/q221 document); shards carry its scaled longs
    val withFeats = docs.select(col("doc_id"), col("source"), col("text"))
      .join(graft.queries.CurationQueries.probeScaled(spark, blownDir),
        "doc_id")
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.DISK_ONLY)
    // exact-quantile monotone cuts (equal-COUNT shards): the blown id
    // space is striped — each copy occupies a tiny prefix of its
    // stride block — so equal-WIDTH cuts land mostly in dead zones
    // (observed: half the shards empty). Monotonicity (the
    // equivalence contract's only requirement) holds for any
    // nondecreasing cut set, so take exact doc_id quantiles.
    val cuts = Seq(Long.MinValue) ++
      docs.stat.approxQuantile("doc_id",
        (1 until shards).map(_.toDouble / shards).toArray, 0.0)
        .map(_.toLong).toSeq.distinct.sorted ++
      Seq(Long.MaxValue)
    val nShards = cuts.size - 1
    val shardWalls = cuts.sliding(2).zipWithIndex.map {
      case (Seq(a, b), i) =>
        val t = System.nanoTime()
        CurationPipeline.ingestShard(
          withFeats.filter(col("doc_id") >= a && col("doc_id") < b),
          dirs, holdout)
        if ((i + 1) % compactEvery == 0 && i + 1 < nShards) {
          graft.ops.Dedup.compactSidecar(spark, dirs.digests)
          graft.ops.Dedup.compactChunkKeySidecar(spark, dirs.chunks)
          graft.ops.LinearProbe.compactGramSidecar(spark, dirs.gram,
            CurationPipeline.FeatureDim)
        }
        (System.nanoTime() - t) / 1e9
    }.toSeq
    val tf = System.nanoTime()
    val (dInc, nInc) = digestOf(CurationPipeline.finalizePipeline(spark, dirs))
    val finalizeSec = (System.nanoTime() - tf) / 1e9

    require(dInc == dOne && nInc == nOne,
      s"incremental deep run diverged from one-shot: " +
        s"incremental=($dInc,$nInc) oneshot=($dOne,$nOne)")
    val wallsJson = shardWalls.map(w => f"$w%.3f").mkString("[", ",", "]")
    println(f"""{"metric":"incremental_deep","copies":$copies,""" +
      f""""shards":$nShards,"compact_every":$compactEvery,""" +
      f""""output_rows":$nInc,"oneshot_sec":$oneShotSec%.3f,""" +
      f""""ingest_sec_per_shard":$wallsJson,""" +
      f""""ingest_total_sec":${shardWalls.sum}%.3f,""" +
      f""""finalize_sec":$finalizeSec%.3f,"identical":true}""")
    spark.stop()
  }
}
