package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series resampling: per key, a regular time grid with the last
  * observation carried forward (LOCF) onto each grid point — the standard
  * gap-filling primitive (hourly sensor rollups, feature-store
  * point-in-time reads).
  *
  * Shape: one agg to get each key's [min, max] span, one explode to lay
  * the grid (metadata only — observations are never replicated), then the
  * single-shuffle [[AsOfJoin]]. Grid density is `span/step` rows per key;
  * everything shuffles on the key column only.
  */
object Resample {

  /** @param obs      observations (keyCol, tsCol, valueCol)
    * @param step     grid step in tsCol units
    * Grid points are aligned to multiples of `step` (floor of the key's
    * min ts) through the key's max ts, so bucket boundaries are stable
    * regardless of when observations arrive.
    */
  def locf(obs: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      step: Long): DataFrame = {
    val spans = obs.groupBy(col(keyCol))
      .agg(min(col(tsCol)).as("__min_ts"), max(col(tsCol)).as("__max_ts"))
    // floor-to-step via pmod: exact integer arithmetic (a double division
    // would corrupt >2^53 epoch-nano timestamps) and true floor semantics
    // for negative timestamps (integer `div` truncates toward zero)
    val gridStart = col("__min_ts") - pmod(col("__min_ts"), lit(step))
    val grid = spans.select(
      col(keyCol),
      explode(sequence(gridStart, col("__max_ts"), lit(step))).as("grid_ts"))
    AsOfJoin.asOf(
      left = grid, right = obs.select(col(keyCol), col(tsCol), col(valueCol)),
      keys = Seq(keyCol), leftTs = "grid_ts", rightTs = tsCol,
      rightPayload = Seq((valueCol, s"${valueCol}_locf")))
  }
}
