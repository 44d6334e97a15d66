package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for each left row, attach the latest right row with
  * `right.ts <= left.ts`, matching on equi-keys.
  *
  * Implementation is the union+window algorithm, not a range join:
  * both sides are unioned with a side tag, sorted once per key by
  * (ts, side) — right rows first at equal ts so `<=` holds — and the
  * right payload is carried forward with `last(..., ignoreNulls)`.
  *
  * Scale: ONE shuffle on the key columns and a single ordered window pass;
  * no O(left × right-candidates) range-predicate explosion, no broadcast
  * requirement. Skewed keys AQE-split like any window. This is the
  * standard streaming-friendly formulation (same shape as point-in-time
  * joins in feature stores).
  */
object AsOfJoin {

  /** @param left      left (probe) relation
    * @param right     right (reference) relation
    * @param keys      equi-join key column names (present on both sides)
    * @param leftTs    left ordering column (numeric or timestamp)
    * @param rightTs   right ordering column (same type)
    * @param rightPayload right columns to attach, renamed as given: (src, out)
    * @param tolerance  max allowed |left.ts - right.ts| (same units);
    *                   None = unbounded look-back/ahead
    * @param direction  "backward" (latest right with ts <= left.ts — the
    *                   default point-in-time lookup) or "forward" (earliest
    *                   right with ts >= left.ts)
    */
  def asOf(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      rightPayload: Seq[(String, String)],
      tolerance: Option[Column] = None,
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward", direction)
    val back = direction == "backward"

    val leftCols = left.columns.toSeq
    val payloadStruct = struct(
      col(rightTs).as("__asof_ts") +:
        rightPayload.map { case (src, out) => col(src).as(out) }: _*)

    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(if (back) 1 else 0))
      .withColumn("__payload", lit(null).cast(
        right.select(payloadStruct).schema.head.dataType))
    val r = right
      .select(keys.map(col) :+ col(rightTs).as("__ts") :+ payloadStruct.as("__payload"): _*)
      .withColumn("__side", lit(if (back) 0 else 1))

    val unioned = l.select(
      (keys.map(col) :+ col("__ts") :+ col("__side") :+ col("__payload")) ++
        leftCols.filterNot(keys.contains).map(c => col(c)): _*)
      .unionByName(r, allowMissingColumns = true)

    // backward: right rows sort BEFORE left at equal ts, carry LAST right
    // forward over an unbounded-preceding frame → latest right with <=.
    // forward: right rows sort AFTER left at equal ts, carry FIRST right
    // backward over an unbounded-following frame → earliest right with >=.
    val ordered = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
    val carried =
      if (back) unioned.withColumn("__match",
        last(col("__payload"), ignoreNulls = true).over(
          ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      else unioned.withColumn("__match",
        first(col("__payload"), ignoreNulls = true).over(
          ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing)))

    val gap =
      if (back) col("__ts") - col("__match.__asof_ts")
      else col("__match.__asof_ts") - col("__ts")
    val inTolerance = tolerance match {
      case Some(tol) => col("__match").isNotNull && gap <= tol
      case None => col("__match").isNotNull
    }
    val matched = when(inTolerance, col("__match"))

    carried
      .filter(col("__side") === lit(if (back) 1 else 0))
      .select(leftCols.map(col) ++
        rightPayload.map { case (_, out) => matched.getField(out).as(out) }: _*)
  }
}
