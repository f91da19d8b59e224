package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave: known bit patterns land at the right positions") {
    // x=0b11, y=0b01, 2 bits: z = y1 x1 y0 x0 = 0 1 1 1 = 7
    val got = Seq((3L, 1L)).toDF("x", "y")
      .select(ZOrder.interleave(Seq(col("x"), col("y")), bits = 2).as("z"))
      .head().getLong(0)
    assert(got === 7L)
    // x=0b10, y=0b11 -> z = y1 x1 y0 x0 = 1 1 1 0 = 14
    val got2 = Seq((2L, 3L)).toDF("x", "y")
      .select(ZOrder.interleave(Seq(col("x"), col("y")), bits = 2).as("z"))
      .head().getLong(0)
    assert(got2 === 14L)
  }

  test("degenerate inputs: empty frame, all-null column, null values " +
      "write without error and keep every row") {
    val dir = java.nio.file.Files.createTempDirectory("zdeg").toString
    // empty input: stats row is all null -> bucket 0, no NPE
    ZOrder.writeZOrdered(
      spark.range(0).select(col("id").as("x"), col("id").as("y")),
      s"$dir/empty", Seq("x", "y"), bits = 4, numFiles = Some(1))
    assert(spark.read.parquet(s"$dir/empty").count() === 0)
    // all-null z column + scattered null values: rows must survive
    // with z-buckets coalesced to 0, not be dropped or crash
    val df = Seq((Some(1L), Option.empty[Long]), (None, None),
      (Some(5L), None), (Some(9L), None)).toDF("x", "y")
    ZOrder.writeZOrdered(df, s"$dir/nulls", Seq("x", "y"), bits = 4,
      numFiles = Some(1))
    assert(spark.read.parquet(s"$dir/nulls").count() === 4)
  }

  /** (min, max) per row group for `column`, from the parquet footers. */
  private def groupRanges(dir: String, column: String): Seq[(Double, Double)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.getPath.getName.endsWith(".parquet")).toSeq
      .flatMap { f =>
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f.getPath, conf))
        try {
          val footer = reader.getFooter
          (0 until footer.getBlocks.size()).map { b =>
            val cols = footer.getBlocks.get(b).getColumns
            val cc = (0 until cols.size()).map(cols.get)
              .find(_.getPath.toDotString == column).get
            val st = cc.getStatistics
            (st.genericGetMin.asInstanceOf[Number].doubleValue(),
              st.genericGetMax.asInstanceOf[Number].doubleValue())
          }
        } finally reader.close()
      }
  }

  test("z-order prunes row groups for 2-D box queries that a linear sort " +
      "must scan; the trailing dimension is unbounded only under linear") {
    // deterministic 2-D spread: both dims independently uniform-ish.
    // 20M rows ≈ 1200 row groups at the 256 KB block size — enough
    // granularity for the z-curve's box pruning to beat the linear
    // sort decisively (the advantage ∝ √#groups; see below)
    val n = 20000000
    val df = spark.range(n.toLong).select(
      (col("id") * 48271 % 65536).as("x"),
      (col("id") * 16807 % 65536).as("y"))
    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString + "/t"
    val linDir = java.nio.file.Files.createTempDirectory("linear").toString + "/t"
    // few files, small row groups -> many independently-pruned stat
    // ranges per file (the granularity pruning actually works at)
    val opts = Map("parquet.block.size" -> (256 * 1024).toString)
    ZOrder.writeZOrdered(df, zDir, Seq("x", "y"), bits = 8,
      numFiles = Some(8), writerOptions = opts)
    df.repartitionByRange(8, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").options(opts).parquet(linDir)

    val zx = groupRanges(zDir, "x"); val zy = groupRanges(zDir, "y")
    val lx = groupRanges(linDir, "x"); val ly = groupRanges(linDir, "y")
    assert(zx.size === zy.size && lx.size === ly.size)
    assert(zx.size >= 32, s"want many row groups, got ${zx.size}")

    // linear layout: trailing column y spans ~the whole range in every
    // group; z-order bounds it
    def meanSpan(r: Seq[(Double, Double)]) =
      r.map { case (mn, mx) => (mx - mn) / 65535.0 }.sum / r.size
    assert(meanSpan(ly) > 0.8, s"linear y-span ${meanSpan(ly)}")
    assert(meanSpan(zy) < 0.5, s"z y-span ${meanSpan(zy)}")

    // 64 deterministic 2%-side box queries: count row groups whose
    // (x, y) stat ranges intersect the box — the groups a reader must
    // actually scan. The z advantage grows with row-group count
    // (touched ∝ s·G for linear vs ≈ (s+1/√G)²·G for z): at the
    // ~128 MB groups of a 100 TB table the same box prunes orders of
    // magnitude more; this test demonstrates the crossover at a
    // granularity cheap enough for CI.
    val side = 0.02 * 65536
    def touched(xs: Seq[(Double, Double)], ys: Seq[(Double, Double)],
                bx: Double, by: Double): Int =
      xs.zip(ys).count { case ((xmn, xmx), (ymn, ymx)) =>
        xmx >= bx && xmn <= bx + side && ymx >= by && ymn <= by + side
      }
    val boxes = for (i <- 0 until 8; j <- 0 until 8)
      yield (i * 0.118 * 65536, j * 0.118 * 65536)
    val zTouched = boxes.map { case (bx, by) => touched(zx, zy, bx, by) }.sum
    val linTouched = boxes.map { case (bx, by) => touched(lx, ly, bx, by) }.sum
    assert(zTouched * 2 < linTouched,
      s"z-order touched $zTouched of ${zx.size * boxes.size}, " +
        s"linear touched $linTouched — expected >2x pruning win")
  }
}
