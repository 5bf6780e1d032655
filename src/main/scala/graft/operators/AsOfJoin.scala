package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row with the
  * same key whose time is at or before the left row's time — THE
  * time-series join (telemetry enrichment, trade/quote matching).
  *
  * Spark has no built-in as-of join. The naive formulation is a range
  * join (`l.time >= r.time` non-equi) which Spark plans as a broadcast
  * nested loop — quadratic per key. This implementation uses the
  * union-and-window shape instead:
  *
  *   1. tag both sides, union on (key, time) — ONE shuffle on the key;
  *   2. `last(right_value, ignoreNulls) over (partition key order time)`
  *      carries the most recent right value forward;
  *   3. keep left rows.
  *
  * Cost: one shuffle + one sort per side, linear in input — survives a
  * 100× scale-up where the nested loop doesn't. (A custom SparkPlan could
  * merge pre-sorted buckets without the window, but the declarative form
  * already gets partial ordering from the shuffle sort.)
  *
  * Ties (equal time): the right row is considered visible to left rows at
  * the same timestamp; among same-time right rows the last by `tieBreak`
  * wins — deterministic given a total-ordering tie-break column.
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     reference side (its columns get `valueCols` selected)
    * @param key       equi-join key column name (present on both sides)
    * @param time      event-time column name (present on both sides)
    * @param valueCols right columns to carry (renamed as given)
    * @param tieBreak  right column making same-(key,time) rows ordered
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      valueCols: Seq[String],
      tieBreak: String): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null: String).cast(right.schema(tieBreak).dataType))
    val lPadded = valueCols.foldLeft(l)((df, c) =>
      df.withColumn(s"__r_$c", lit(null).cast(right.schema(c).dataType)))
    val r = right
      .withColumn("__side", lit(0))
      .withColumn("__tie", col(tieBreak))
    val rPadded = valueCols
      .foldLeft(r)((df, c) => df.withColumn(s"__r_$c", col(c)))
      .select((Seq(key, time, "__side", "__tie") ++ valueCols.map(c => s"__r_$c")).map(col): _*)
    // null-pad the left-only columns on the right side
    val rAligned = leftCols.foldLeft(rPadded) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val unioned = lPadded.select(rAligned.columns.map(col): _*).unionByName(rAligned)

    // right rows (side 0) sort before left rows at the same time → visible
    val w = Window
      .partitionBy(col(key))
      .orderBy(col(time), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(unioned)((df, c) =>
      df.withColumn(s"asof_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w)))
    carried
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ valueCols.map(c => col(s"asof_$c")): _*)
  }
}
