package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * without Expand, one true pass, merge-safe on any partitioning (the
  * ±~2.3% default-precision error bound is contract-checked by q115).
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // resolve each requested name ONCE via backtick quoting (doubling
    // embedded backticks), and alias every aggregate positionally — no
    // user-controlled text ever reaches a parsed SQL fragment, so names
    // with quotes/commas/dots/spaces profile like any other (spec-pinned)
    def resolved(c: String): Column = col("`" + c.replace("`", "``") + "`")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      val raw = resolved(c)
      val s = raw.cast("string")
      Seq(
        count(lit(1)).as(s"c${i}_n"),
        sum(when(raw.isNull, 1L).otherwise(0L)).as(s"c${i}_nulls"),
        (if (approxDistinct) approx_count_distinct(raw)
         else count_distinct(raw)).as(s"c${i}_ndv"),
        min(s).as(s"c${i}_min"),
        max(s).as(s"c${i}_max"),
        coalesce(sum(length(s).cast("long")), lit(0L)).as(s"c${i}_len"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single stats row to one output row per column — an
    // explode over per-column structs (the expression-level equivalent
    // of stack(), with the names carried as literals, not SQL text)
    val rows = cols.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c).as("col_name"),
        col(s"c${i}_n").as("n_rows"),
        col(s"c${i}_nulls").as("n_nulls"),
        col(s"c${i}_ndv").as("n_distinct"),
        col(s"c${i}_min").as("min_value"),
        col(s"c${i}_max").as("max_value"),
        col(s"c${i}_len").as("sum_len"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Functional-dependency / label-consistency audit for lhs → rhs: per
    * LHS value, row count, distinct RHS count, the MAJORITY rhs
    * (count DESC, rhs ASC — a total order) and how many rows disagree
    * with it (the violation count, with its exact-quotient rate). On
    * (source → lang) this is the label-purity report an annotation
    * pipeline reviews; n_rhs = 1 everywhere certifies the dependency
    * holds.
    *
    * Two partial-aggregating groupBys — (lhs, rhs) counts, then per-lhs
    * fold over the collapsed frame (bounded by distinct pairs, never
    * rows) — plus one window for the majority pick on that same
    * collapsed frame. All outputs exact.
    */
  def fdAudit(df: DataFrame, lhsCol: String, rhsCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lhs")).orderBy(col("__c").desc, col("rhs"))
    val pairs = df
      .select(col(lhsCol).as("lhs"), col(rhsCol).as("rhs"))
      .groupBy(col("lhs"), col("rhs")).agg(count(lit(1)).as("__c"))
    pairs
      .withColumn("__rk", row_number().over(w))
      .groupBy(col("lhs"))
      .agg(sum(col("__c")).as("n_rows"),
        count(lit(1)).as("n_rhs"),
        max(when(col("__rk") === 1, col("rhs"))).as("majority_rhs"),
        max(when(col("__rk") === 1, col("__c"))).as("__mc"))
      .select(col("lhs").as(lhsCol), col("n_rows"), col("n_rhs"),
        col("majority_rhs"),
        (col("n_rows") - col("__mc")).as("n_violations"),
        round((col("n_rows") - col("__mc")).cast("double") /
          col("n_rows"), 4).as("violation_rate"))
  }
}
