package graft.etl

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Physical-range quality audit — SURVEY §2 F4-F6 + S12, the Spark
  * re-expression of `quality_audit.py:18-77`.
  *
  * The reference issues one sink round-trip per constraint
  * (`quality_audit.py:42-52`); here all constraint counts, the null audit
  * (etl_meteo.py:236-247) and the total land in ONE scan + aggregate.
  * Range predicates (`f < lo OR f > hi`) stay plain comparisons so Parquet
  * scans get min/max-stats row-group skipping.
  */
final case class QualityReport(
    totalRows: Long,
    anomalyCounts: Map[String, Long],
    nullCounts: Map[String, Long],
    totalAnomalies: Long,
    errorRatePct: Double)

object QualityAudit {

  def outOfRange(field: String, lo: Double, hi: Double): Column =
    col(field).isNotNull && (col(field) < lit(lo) || col(field) > lit(hi))

  /** Single-pass plan: total, per-constraint anomaly counts, per-field null
    * counts (exposed for Verify/oracle checks).
    */
  def aggregated(df: DataFrame,
      constraints: Seq[(String, Double, Double)] = WeatherSchema.qualityConstraints): DataFrame = {
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("total_rows")) ++
        constraints.map { case (f, lo, hi) =>
          sum(when(outOfRange(f, lo, hi), 1L).otherwise(0L)).as(s"anom_$f")
        } ++
        WeatherSchema.numericFields.map(f =>
          sum(when(col(f).isNull, 1L).otherwise(0L)).as(s"nulls_$f"))
    df.agg(aggs.head, aggs.tail: _*)
  }

  def compute(df: DataFrame,
      constraints: Seq[(String, Double, Double)] = WeatherSchema.qualityConstraints): QualityReport = {
    val row: Row = aggregated(df, constraints).head()
    val anoms = constraints.map { case (f, _, _) =>
      f -> row.getAs[Long](s"anom_$f")
    }.toMap
    val nulls = WeatherSchema.numericFields.map(f =>
      f -> row.getAs[Long](s"nulls_$f")).toMap
    val total = row.getAs[Long]("total_rows")
    val anomTotal = anoms.values.sum
    QualityReport(
      totalRows = total,
      anomalyCounts = anoms,
      nullCounts = nulls,
      totalAnomalies = anomTotal,
      errorRatePct = if (total == 0) 0.0 else anomTotal.toDouble / total * 100.0)
  }
}
