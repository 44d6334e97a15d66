package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Z-order (Morton) clustering for multi-dimensional data skipping — the
  * lakehouse layout trick that makes per-file min/max statistics prune on
  * TWO columns at once: sort by the bit-interleaved key and every file
  * covers a small rectangle of (x, y) space, so a predicate on EITHER
  * dimension skips most files, where a linear sort gives tight spans on
  * its sort column and useless full-range spans on everything else.
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of two non-negative longs:
    * bit i of `x` lands at position 2i, bit i of `y` at 2i+1. Unrolled
    * into 2·`bits` codegen'd bitwise terms (Spark's shiftleft takes a
    * literal shift, so the loop runs at plan-build time — this is also
    * what keeps the expression whole-stage-codegen-friendly).
    */
  def zOrder2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftrightunsigned(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Data-skipping effectiveness audit: assign rows to files of
    * `rowsPerFile` under (a) a linear sort on `x` and (b) the z-order
    * sort, then report the average per-file span (max−min) of each
    * dimension per strategy. The z-order row should show BOTH spans
    * small; the linear row shows a tight x span and a full-range y span
    * — the number that justifies re-clustering a 100 TB table.
    *
    * The rank window is a single global sort per strategy — this is an
    * offline layout audit (like the compaction job it models), not a
    * serving-path operator.
    */
  def skippingAudit(df: DataFrame, xCol: Column, yCol: Column,
      rowsPerFile: Int = 1000, bits: Int = 16): DataFrame = {
    require(rowsPerFile >= 1)
    val base = df.select(xCol.cast("long").as("x"), yCol.cast("long").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull &&
        col("x") >= 0 && col("y") >= 0)
      .withColumn("z", zOrder2(col("x"), col("y"), bits))
    def spans(ordered: Column, strategy: String): DataFrame = {
      // deterministic total order: tie-break on (x, y) so file
      // assignment is partition-independent
      val w = Window.orderBy(ordered, col("x"), col("y"))
      base
        .withColumn("file",
          floor((row_number().over(w) - 1) / rowsPerFile).cast("long"))
        .groupBy(col("file"))
        .agg((max(col("x")) - min(col("x"))).as("xs"),
          (max(col("y")) - min(col("y"))).as("ys"))
        .agg(count(lit(1)).as("files"),
          round(avg(col("xs")), 4).as("avg_x_span"),
          round(avg(col("ys")), 4).as("avg_y_span"))
        .select(lit(strategy).as("strategy"), col("files"),
          col("avg_x_span"), col("avg_y_span"))
    }
    spans(col("x"), "linear_x").unionByName(spans(col("z"), "zorder"))
  }
}
