package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** As-of (point-in-time) join: for each left row, attach the payload
  * of the latest right row with `rightTime <= leftTime` for the same
  * key — the temporal lookup Spark has no built-in operator for.
  *
  * Implementation is the union-and-window composition (preference (a)
  * of the custom-operator ladder): tag both sides, union them, and
  * take `last_value(payload) IGNORE NULLS` over a window ordered by
  * (time, side) within each key. Cost at scale: ONE shuffle on the key
  * — the same lower bound a dedicated sort-merge as-of operator would
  * pay — versus the naive equi-join + groupBy-max which shuffles twice
  * and explodes matched pairs first.
  *
  * Tie semantics: right rows at exactly `leftTime` ARE visible
  * (`>=`, DuckDB ASOF semantics); among equal right timestamps the
  * greatest `tiebreak` wins deterministically.
  */
object AsOf {

  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTimeCol: String, rightTimeCol: String,
               payloadCols: Seq[String], tiebreak: Option[String] = None,
               outPrefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!payloadCols.exists(leftCols.contains),
      "payload column names must not collide with left columns")

    def typedNull(df: DataFrame, c: String): Column =
      lit(null).cast(df.schema(c).dataType)

    val lTagged = left.select(
      (leftCols.map(col) :+
        col(leftTimeCol).as("__t") :+
        lit(1).as("__side")) ++
        payloadCols.map(c => typedNull(right, c).as(c)): _*)
    val rTagged = right.select(
      (leftCols.map(c =>
        if (keys.contains(c)) col(c) else typedNull(left, c).as(c)) :+
        col(rightTimeCol).as("__t") :+
        lit(0).as("__side")) ++
        payloadCols.map(col): _*)

    // Tiebreak orders in the column's NATIVE type: a string cast would
    // compare numeric tiebreaks lexicographically ('9' > '10'). Left
    // rows carry null payloads → nulls first, so they never outrank a
    // real right-side tiebreak at the same (__t, __side).
    val order = Seq(col("__t"), col("__side")) ++
      tiebreak.map(c => col(c).asc_nulls_first).toSeq
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = lTagged.unionByName(rTagged)
      .select((leftCols.map(col) :+ col("__side")) ++
        payloadCols.map(c =>
          last(col(c), ignoreNulls = true).over(w).as(s"$outPrefix$c")): _*)

    joined.filter(col("__side") === 1).drop("__side")
  }

  /** Forward as-of join: for each left row, attach the payload of the
    * EARLIEST right row with `rightTime >= leftTime` for the same key —
    * the "next event after" lookup (next purchase after an error, next
    * reading after a request). Mirror image of [[asOfJoin]]: the window
    * runs (currentRow, unboundedFollowing) with `first_value IGNORE
    * NULLS`, and at equal timestamps left rows sort BEFORE right rows
    * so a right row at exactly `leftTime` IS visible (`>=`). Among
    * equal right timestamps the SMALLEST tiebreak wins (the earliest —
    * forward symmetry of the backward join's greatest-wins). Same
    * single-shuffle-on-key cost. */
  def asOfJoinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTimeCol: String, rightTimeCol: String,
                      payloadCols: Seq[String], tiebreak: Option[String] = None,
                      outPrefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!payloadCols.exists(leftCols.contains),
      "payload column names must not collide with left columns")

    def typedNull(df: DataFrame, c: String): Column =
      lit(null).cast(df.schema(c).dataType)

    // left tags 0 so it sorts before equal-time right rows (tag 1):
    // the forward window starting at the left row then includes them
    val lTagged = left.select(
      (leftCols.map(col) :+
        col(leftTimeCol).as("__t") :+
        lit(0).as("__side")) ++
        payloadCols.map(c => typedNull(right, c).as(c)): _*)
    val rTagged = right.select(
      (leftCols.map(c =>
        if (keys.contains(c)) col(c) else typedNull(left, c).as(c)) :+
        col(rightTimeCol).as("__t") :+
        lit(1).as("__side")) ++
        payloadCols.map(col): _*)

    // nulls LAST here: left rows carry null payloads and must never
    // outrank a real right-side tiebreak at the same (__t, __side)
    val order = Seq(col("__t"), col("__side")) ++
      tiebreak.map(c => col(c).asc_nulls_last).toSeq
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val joined = lTagged.unionByName(rTagged)
      .select((leftCols.map(col) :+ col("__side")) ++
        payloadCols.map(c =>
          first(col(c), ignoreNulls = true).over(w).as(s"$outPrefix$c")): _*)

    joined.filter(col("__side") === 0).drop("__side")
  }
}
