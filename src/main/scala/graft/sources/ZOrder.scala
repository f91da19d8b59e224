package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout: interleave the bits of several
  * quantized sort keys so that rows close in EVERY key dimension land
  * close in the one-dimensional file order. Parquet keeps per-row-group
  * min/max statistics per column; after a z-ordered write each row
  * group spans a narrow range of EVERY z-dimension — so a box predicate
  * (`user BETWEEN … AND value BETWEEN …`) skips most row groups, where
  * a linearly-sorted layout only ever prunes on its leading column and
  * scans everything for the second dimension. The standard layout trick
  * behind Delta/Iceberg `OPTIMIZE ZORDER BY`, built here from pure
  * Column bit arithmetic (codegen'd end-to-end; no UDFs, no custom
  * expression needed).
  *
  * Quantization: each key is affinely mapped to a `bits`-wide integer
  * bucket by its global min/max (one tiny aggregate — 2 longs per
  * column — collected to the driver). Monotone per dimension, so
  * range predicates on the original columns translate to ranges of
  * buckets; ties inside a bucket don't matter for pruning.
  */
object ZOrder {

  /** The interleaved z-value for pre-quantized bucket columns
    * (each in [0, 2^bits)): bit b of bucket i lands at position
    * b*n + i of the z-value. Pure bit ops — stays in whole-stage
    * codegen. Supports up to 4 dims × 16 bits (64-bit z-value). */
  private[sources] def interleave(buckets: Seq[Column], bits: Int): Column = {
    require(buckets.nonEmpty && buckets.size * bits <= 64,
      s"${buckets.size} dims x $bits bits exceeds a 64-bit z-value")
    val n = buckets.size
    val terms = for {
      b <- 0 until bits
      (c, i) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce((a, z) => a.bitwiseOR(z))
  }

  /** Write `df` as parquet in z-order of `zCols` (numeric columns).
    * Rows are range-partitioned AND sorted within partitions by the
    * z-value, so both file-level and row-group-level min/max stats are
    * tight in every z-dimension. The min/max quantization bounds come
    * from one 2-value-per-column aggregate (bounded driver collect).
    * Degenerate columns (min == max) quantize to bucket 0.
    *
    * Pruning granularity = row-group count: size row groups via
    * `writerOptions` (e.g. `parquet.block.size`) so a file holds
    * several — the z-curve's box-pruning advantage over a linear sort
    * grows with the number of independently-pruned stat ranges.
    *
    * @param numFiles      output file count (range partitions); None =
    *                      session shuffle parallelism
    * @param writerOptions extra parquet writer options */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
                    bits: Int = 16, numFiles: Option[Int] = None,
                    writerOptions: Map[String, String] = Map.empty): Unit = {
    require(zCols.nonEmpty, "need at least one z-order column")
    val aggCols = zCols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(col(c)).cast("double").as(s"mn$i"),
        max(col(c)).cast("double").as(s"mx$i"))
    }
    val stats = df.agg(aggCols.head, aggCols.tail: _*).head()
    val maxBucket = (1L << bits) - 1
    val buckets = zCols.zipWithIndex.map { case (c, i) =>
      // null min/max (empty input or all-null column) degenerates to
      // bucket 0 like min == max — never an NPE at the driver
      val mn = if (stats.isNullAt(2 * i)) 0.0 else stats.getDouble(2 * i)
      val mx = if (stats.isNullAt(2 * i + 1)) 0.0
               else stats.getDouble(2 * i + 1)
      if (mx <= mn) lit(0L)
      // null VALUES bucket to 0 (coalesce) — a single null dimension
      // must not null the whole interleaved z-value for the row
      else coalesce(least(greatest(
        floor((col(c).cast("double") - lit(mn)) / lit(mx - mn) * maxBucket)
          .cast("long"), lit(0L)), lit(maxBucket)), lit(0L))
    }
    val withZ = df.withColumn("__z", interleave(buckets, bits))
    val parted = numFiles match {
      case Some(n) => withZ.repartitionByRange(n, col("__z"))
      case None => withZ.repartitionByRange(col("__z"))
    }
    parted.sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .options(writerOptions)
      .parquet(path)
  }
}
