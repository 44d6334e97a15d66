package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiler — the engine-side equivalent of the
  * reference's integrity report (`etl_meteo.py:110-135` computes row
  * count, per-column null counts and min/max in separate pandas passes)
  * generalized to arbitrary tables: for each requested column, row count,
  * null count, distinct count, min/max (rendered as strings so one output
  * schema fits every column type) and total rendered length, all from a
  * SINGLE aggregation job.
  *
  * Scale: the exact-distinct form plans one Expand (×(k+1) rows for k
  * profiled columns) feeding a partial+final aggregate — the standard
  * multi-distinct plan; fine up to a handful of columns. For wide tables
  * at 100 TB use `approxDistinct = true`: HLL++ sketches aggregate
  * without Expand, one true pass, merge-safe on any partitioning.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      val s = col(c).cast("string")
      Seq(
        count(lit(1)).as(s"n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"),
        (if (approxDistinct) approx_count_distinct(col(c))
         else count_distinct(col(c))).as(s"ndv_$c"),
        min(s).as(s"min_$c"),
        max(s).as(s"max_$c"),
        coalesce(sum(length(s).cast("long")), lit(0L)).as(s"len_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single stats row to one output row per column
    val stacked = cols.map { c =>
      s"'$c', n_$c, nulls_$c, ndv_$c, min_$c, max_$c, len_$c"
    }.mkString(", ")
    one.select(expr(
      s"stack(${cols.size}, $stacked) AS " +
        "(col_name, n_rows, n_nulls, n_distinct, min_value, max_value, sum_len)"))
  }
}
