package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.CleanValue._

/** The transform core — SURVEY §2 P1-P4, F1-F2, S1-S9 — as one declarative
  * projection per source. Everything is a native Column expression, so the
  * whole transform is a single narrow stage inside whole-stage codegen:
  * scan → project → filter, no shuffle, no UDFs.
  */
object WeatherTransforms {

  /** Weather Underground CSV → unified 8-column table
    * (`clean_and_convert_csv_df`, etl_meteo.py:48-67).
    *
    * Expects the raw columns `Time Temperature Humidity Pressure Speed` and
    * `Precip. Accum.` plus a `file_date` tag. Rows whose `Time` is not a
    * plausible clock time produce a null `date_heure_utc` and are dropped
    * (F1/F2) — this is what eliminates the units row and summary rows.
    */
  def fromWuCsv(raw: DataFrame, stationId: String, source: String): DataFrame =
    fromWuCsv(raw, lit(stationId), source)

  /** Column-typed station variant — the fleet path ([[WuCsvSource.readFleet]])
    * attaches the station per ROW from the manifest lookup instead of per
    * DataFrame, so one scan serves every station.
    */
  def fromWuCsv(raw: DataFrame, stationId: Column, source: String): DataFrame = {
    // Reference type-guard: Time must be a (clock-time) string (etl_meteo.py:59).
    val timeOk = col("Time").isNotNull && col("Time").rlike("^\\d{1,2}:\\d{2}")
    raw.select(
      when(timeOk, concat_ws(" ", col("file_date"), col("Time")))
        .as("date_heure_utc"),                                        // S8
      fahrenheitToCelsius(cleanValue(col("Temperature"))).as("temperature_c"), // S1+S2
      cleanValue(col("Humidity")).as("humidite_pct"),                 // S1
      inHgToHpa(cleanValue(col("Pressure"))).as("pression_hpa"),      // S1+S3
      mphToMs(cleanValue(col("Speed"))).as("vent_vitesse_ms"),        // S1+S4
      inchesToMm(cleanValue(col("`Precip. Accum.`"))).as("pluie_accum_mm"), // S1+S5
      stationId.as("id_station"),                                     // P3
      lit(source).as("source_donnees"))                               // P3
      .na.drop(Seq("date_heure_utc"))                                 // F1
  }

  /** `float(x) if x else None` — the JSON-path falsy gate (etl_meteo.py:98-100):
    * ''/null → null, "0" survives as 0.0, junk → null.
    */
  private def floatOrNone(c: Column): Column = numOrNull(c)

  /** Python `record.get(k1, record.get(k3, 0)) or 0` rain semantics
    * (etl_meteo.py:93): if pluie_1h is present, '' yields 0 WITHOUT falling
    * back to pluie_3h; only an absent/null pluie_1h consults pluie_3h.
    * (Schema-on-read can't distinguish present-null from absent; both take
    * the fallback branch — the only observable divergence, documented here.)
    */
  def rainAccum(p1: Column, p3: Column): Column = {
    def f(c: Column): Column = when(c === "", lit(0.0)).otherwise(coalesce(numOrNull(c), lit(0.0)))
    when(p1.isNotNull, f(p1)).otherwise(when(p3.isNotNull, f(p3)).otherwise(lit(0.0)))
  }

  /** Infoclimat exploded raw records → unified table
    * (`clean_and_convert_json`, etl_meteo.py:79-108).
    */
  def fromInfoclimatJson(raw: DataFrame): DataFrame = {
    raw.select(
      col("dh_utc").as("date_heure_utc"),                              // passthrough (:97)
      floatOrNone(col("temperature")).as("temperature_c"),             // S9 (:98)
      // int(h) if h else None (:99) — integral value, Double column (§1.2)
      floor(floatOrNone(col("humidite"))).cast("double").as("humidite_pct"),
      floatOrNone(col("pression")).as("pression_hpa"),                 // S9 (:100)
      // float(get('vent_moyen', 0) or 0) / 3.6 (:92): missing/''/null → 0
      kmhToMs(numOrZero(col("vent_moyen"))).as("vent_vitesse_ms"),     // S6
      rainAccum(col("pluie_1h"), col("pluie_3h")).as("pluie_accum_mm"), // S7
      // id_station from the record, falling back to the map key (:102)
      coalesce(col("id_station"), col("station_key")).as("id_station"),
      lit(WeatherSchema.SourceInfoclimat).as("source_donnees"))
      .filter(col("date_heure_utc").isNotNull)                         // skip shapeless records
  }

  /** Audit-side timestamp derivation (S10): null on parse failure, like
    * `pd.to_datetime(..., errors='coerce')` (etl_meteo.py:127). The regex
    * guard prefilters cheaply; try_to_timestamp (not to_timestamp) makes
    * the coercion hold under ANSI too — a shaped-but-invalid string like
    * "2024-13-40 25:61:00" passes the regex, and the plain parse would
    * THROW mid-audit with ANSI on instead of coercing to null.
    */
  def parsedTimestamp(c: Column): Column =
    when(c.rlike("^\\d{4}-\\d{2}-\\d{2}[ T]\\d{1,2}:\\d{2}"),
      try_to_timestamp(c))

  /** Multi-format coercing parse covering BOTH unified-table formats —
    * Infoclimat "yyyy-MM-dd HH:mm[:ss]" and Weather Underground
    * "yyyy-MM-dd h:mm AM/PM" — like pandas' flexible to_datetime. Needed
    * wherever audits compare dates chronologically: lexicographic
    * comparison of the raw strings mis-orders 12-hour clock times
    * ("9:04 PM" > "10:04 PM" as strings).
    */
  def parsedTimestampMulti(c: Column): Column = {
    // try_to_timestamp: the regex shapes can still carry out-of-range
    // fields ("9:99 PM"); coercion must survive ANSI (see above)
    def guarded(pattern: String, fmt: String): Column =
      when(c.rlike(pattern), try_to_timestamp(c, lit(fmt)))
    coalesce(
      guarded("^\\d{4}-\\d{2}-\\d{2} \\d{1,2}:\\d{2}:\\d{2}$", "yyyy-MM-dd H:mm:ss"),
      guarded("^\\d{4}-\\d{2}-\\d{2} \\d{1,2}:\\d{2}$", "yyyy-MM-dd H:mm"),
      guarded("^\\d{4}-\\d{2}-\\d{2} \\d{1,2}:\\d{2} (AM|PM)$", "yyyy-MM-dd h:mm a"))
  }
}
