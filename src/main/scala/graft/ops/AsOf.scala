package graft.ops

import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
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
  *
  * All payload columns are carried as ONE struct and the window picks
  * the struct, so every output payload field comes from the SAME right
  * row — per-column ignore-nulls windows would stitch fields from
  * different right rows whenever the matched row has a null field.
  */
object AsOf {

  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTimeCol: String, rightTimeCol: String,
               payloadCols: Seq[String], tiebreak: Option[String] = None,
               outPrefix: String = "asof_"): DataFrame = {
    // Left rows sort AFTER right rows at equal time (__side 1 vs 0) so
    // a right row at exactly leftTime is visible; among equal right
    // timestamps the GREATEST tiebreak is the last in frame → wins.
    // Left rows carry null tiebreaks → nulls first, so they never
    // outrank a real right-side tiebreak at the same (__t, __side).
    unionAndPick(left, right, keys, leftTimeCol, rightTimeCol, payloadCols,
      tiebreak, outPrefix,
      leftSide = 1, rightSide = 0,
      tbOrder = c => c.asc_nulls_first,
      frame = w => w.rowsBetween(Window.unboundedPreceding, Window.currentRow),
      pick = c => last(c, ignoreNulls = true))
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
    * single-shuffle-on-key cost, same whole-struct payload guarantee. */
  def asOfJoinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTimeCol: String, rightTimeCol: String,
                      payloadCols: Seq[String], tiebreak: Option[String] = None,
                      outPrefix: String = "asof_"): DataFrame =
    // left tags 0 so it sorts before equal-time right rows (tag 1);
    // nulls LAST so null left-row tiebreaks never outrank right rows
    unionAndPick(left, right, keys, leftTimeCol, rightTimeCol, payloadCols,
      tiebreak, outPrefix,
      leftSide = 0, rightSide = 1,
      tbOrder = c => c.asc_nulls_last,
      frame = w => w.rowsBetween(Window.currentRow, Window.unboundedFollowing),
      pick = c => first(c, ignoreNulls = true))

  /** Shared union-and-window body of the two as-of directions. The
    * payload rides as a single struct (`__p`) — null on left rows —
    * and `pick(ignoreNulls)` selects one WHOLE right row's struct,
    * which is then unpacked into the prefixed output columns. */
  private def unionAndPick(left: DataFrame, right: DataFrame,
                           keys: Seq[String], leftTimeCol: String,
                           rightTimeCol: String, payloadCols: Seq[String],
                           tiebreak: Option[String], outPrefix: String,
                           leftSide: Int, rightSide: Int,
                           tbOrder: Column => Column,
                           frame: WindowSpec => WindowSpec,
                           pick: Column => Column): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!payloadCols.exists(leftCols.contains),
      "payload column names must not collide with left columns")

    def typedNull(df: DataFrame, c: String): Column =
      lit(null).cast(df.schema(c).dataType)

    val payloadType = StructType(payloadCols.map(right.schema(_)))
    // the tiebreak column rides OUTSIDE the struct so the sort key
    // orders in its native type without touching the picked payload
    val tbCols = tiebreak.toSeq
    val lTagged = left.select(
      (leftCols.map(col) :+
        col(leftTimeCol).as("__t") :+
        lit(leftSide).as("__side") :+
        lit(null).cast(payloadType).as("__p")) ++
        tbCols.map(c => typedNull(right, c).as(s"__tb_$c")): _*)
    val rTagged = right.select(
      (leftCols.map(c =>
        if (keys.contains(c)) col(c) else typedNull(left, c).as(c)) :+
        col(rightTimeCol).as("__t") :+
        lit(rightSide).as("__side") :+
        struct(payloadCols.map(col): _*).as("__p")) ++
        tbCols.map(c => col(c).as(s"__tb_$c")): _*)

    val order = Seq(col("__t"), col("__side")) ++
      tbCols.map(c => tbOrder(col(s"__tb_$c")))
    val w = frame(Window.partitionBy(keys.map(col): _*).orderBy(order: _*))

    lTagged.unionByName(rTagged)
      .select(leftCols.map(col) :+ col("__side") :+
        pick(col("__p")).over(w).as("__pp"): _*)
      .filter(col("__side") === leftSide)
      .select(leftCols.map(col) ++
        payloadCols.map(c => col("__pp").getField(c).as(s"$outPrefix$c")): _*)
  }
}
