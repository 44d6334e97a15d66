package graft.etl

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Integrity metrics — SURVEY §2 A1-A8 — computed in ONE aggregation pass.
  *
  * The reference computes these with separate full passes (pandas
  * `duplicated().sum()` etl_meteo.py:71,118; `isnull().sum()` :124;
  * `min()/max()` :128-129) and, post-load, one Mongo round-trip per field
  * (:236-247,267-269 — the N+1 pattern). Authoring the audit as a single
  * `agg` fixes that at the API level: one scan, one partial+final hash
  * aggregate, 100 TB-friendly.
  *
  * Duplicate counts use `count - count(distinct key)` ≡ pandas
  * `duplicated(keep='first').sum()`.
  *
  * Date range is chronological: the raw strings are parsed with coercion
  * (like the reference's pd.to_datetime(errors='coerce'),
  * etl_meteo.py:127-129) before min/max — lexicographic min/max would
  * mis-order the WU 12-hour format. Unparseable rows are excluded, as
  * NaT is by pandas min/max.
  */
final case class IntegrityReport(
    totalRows: Long,
    dupByDate: Long,
    dupByDateStation: Long,
    nullCounts: Map[String, Long],
    minDate: Option[String],
    maxDate: Option[String])

object IntegrityReport {

  private def nullCount(c: String): Column =
    sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c")

  /** The single-pass aggregation plan (exposed for tests / Verify). */
  def aggregated(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    val parsed = WeatherTransforms.parsedTimestampMulti(col("date_heure_utc"))
    val aggs: Seq[Column] = Seq(
      count(lit(1)).as("total_rows"),
      // STRUCT-wrapped keys: count_distinct drops null VALUES, so a
      // bare null key would count every null-keyed row as a duplicate;
      // a struct with a null field is itself non-null and groups like
      // pandas' NaN==NaN duplicated(keep='first') semantics
      (count(lit(1)) - count_distinct(struct(col("date_heure_utc"))))
        .as("dup_by_date"),
      (count(lit(1)) -
        count_distinct(struct(col("date_heure_utc"), col("id_station"))))
        .as("dup_by_date_station"),
      date_format(min(parsed), "yyyy-MM-dd HH:mm:ss").as("min_date"),
      date_format(max(parsed), "yyyy-MM-dd HH:mm:ss").as("max_date")) ++ cols.map(nullCount)
    df.agg(aggs.head, aggs.tail: _*)
  }

  def compute(df: DataFrame): IntegrityReport = {
    val row: Row = aggregated(df).head()
    val cols = df.columns.toSeq
    IntegrityReport(
      totalRows = row.getAs[Long]("total_rows"),
      dupByDate = row.getAs[Long]("dup_by_date"),
      dupByDateStation = row.getAs[Long]("dup_by_date_station"),
      nullCounts = cols.map(c => c -> Option(row.getAs[Any](s"nulls_$c"))
        .map(_.asInstanceOf[Long]).getOrElse(0L)).toMap,
      minDate = Option(row.getAs[String]("min_date")),
      maxDate = Option(row.getAs[String]("max_date")))
  }
}
