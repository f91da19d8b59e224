package graft

import graft.functions.{GraftExtensions, GraftFunctions}
import org.apache.spark.sql.SparkSession

/** Opinionated session factory encoding the engine's deployment
  * configuration — the settings that matter at 100 TB, pre-wired:
  *
  *  - AQE on (runtime re-planning: shuffle coalescing, broadcast
  *    downgrade, skew-join splitting);
  *  - skew-join handling explicitly enabled;
  *  - shuffle partitions sized to the actual parallelism instead of
  *    the 200 default (AQE coalesces down, but the ceiling should
  *    reflect the cluster);
  *  - 128 MB scan partitions (`files.maxPartitionBytes` default kept
  *    explicit — the knob to raise for wide-row tables);
  *  - UTC session timezone (oracle/cross-engine parity);
  *  - the engine's custom Catalyst functions injected via
  *    [[GraftExtensions]] so `cosine_sim` & co. resolve in SQL.
  */
object GraftSession {

  def builder(master: String = "local[*]",
              shufflePartitions: Int =
                Runtime.getRuntime.availableProcessors): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.files.maxPartitionBytes", (128L << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions)

  /** Build (or attach to) a session and ensure the custom functions
    * are registered even when an existing session is returned
    * (getOrCreate ignores extensions on reuse). */
  def getOrCreate(master: String = "local[*]"): SparkSession = {
    val spark = builder(master).getOrCreate()
    GraftFunctions.register(spark)
    spark
  }
}
