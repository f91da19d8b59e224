package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range join: points ⋈ intervals on `lo <= v <= hi`.
  *
  * Spark plans a raw interval predicate as a nested-loop join
  * (O(n·m) — unusable at scale). The composition here is the standard
  * binning trick: discretize the value domain into `binWidth` buckets,
  * explode each interval over the buckets it covers, equi-join points
  * to intervals on the bucket id (one hash shuffle), then apply the
  * exact bound predicate to the candidates. Cost is O(points +
  * intervals·span/binWidth + candidates); pick binWidth near the
  * typical interval span so each interval covers O(1) buckets.
  */
object Ranges {

  /** @param points    relation with numeric column `vCol`
    * @param intervals relation with numeric columns `loCol`, `hiCol`
    *                  (inclusive bounds)
    * @return all (point, interval) candidate matches with exact bound
    *         predicate applied; columns = points.* ++ intervals.*   */
  def binnedRangeJoin(points: DataFrame, vCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", floor(col(vCol) / binWidth))
    val i = intervals.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    p.join(i, "__bin")
      .filter(col(vCol) >= col(loCol) && col(vCol) <= col(hiCol))
      .drop("__bin")
  }
}
