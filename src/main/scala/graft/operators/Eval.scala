package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier-evaluation operators over scored corpora — the offline
  * model-quality reports a curation pipeline runs after scoring (the
  * reference's quality_audit.py is a rule audit; these are the
  * model-side analogue, exercised on the same engine surface as the
  * q136/q181/q188 scoring family).
  */
object Eval {

  /** Precision-recall threshold sweep: one row per DISTINCT score,
    * treating "predict positive" as score ≥ threshold — the full PR
    * curve (and F1 sweep) in a single pass, companion to q188's AUC
    * (which integrates this curve's ranking; this exposes the operating
    * points).
    *
    * `labelCol` must be a 0/1 numeric. Counts aggregate per distinct
    * score first, so the descending cumulative window runs on the
    * AGGREGATED frame (bounded by distinct scores, never corpus rows);
    * tp/fp/fn are exact BIGINTs, precision/recall/F1 are single
    * BIGINT-quotient divides rounded 4dp. F1 folds to 2·tp/(pp+p)
    * (pp = predicted positive, p = total positive) — one divide, no
    * chained FP. Requires at least one positive and one scored row;
    * with p = 0 recall/F1 are NULL (division by zero), by design.
    */
  def prCurve(scored: DataFrame, scoreCol: String,
      labelCol: String): DataFrame = {
    val g = scored
      .groupBy(col(scoreCol).as("threshold"))
      .agg(count(lit(1)).as("__n"), sum(col(labelCol)).as("__pos"))
    val wDesc = Window.orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = g.agg(sum(col("__pos")).as("__p"))
    g.withColumn("tp", sum(col("__pos")).over(wDesc))
      .withColumn("__pp", sum(col("__n")).over(wDesc))
      .crossJoin(broadcast(totals))
      .select(col("threshold"), col("tp"),
        (col("__pp") - col("tp")).as("fp"),
        (col("__p") - col("tp")).as("fn"),
        round(col("tp").cast("double") / col("__pp"), 4).as("prec"),
        round(col("tp").cast("double") / col("__p"), 4).as("recall"),
        round(lit(2.0) * col("tp").cast("double") /
          (col("__pp") + col("__p")), 4).as("f1"))
  }
}
