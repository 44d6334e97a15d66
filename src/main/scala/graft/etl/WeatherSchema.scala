package graft.etl

import org.apache.spark.sql.types._

/** The unified hourly weather-observation table — the reference's single
  * logical dataset ("donnees_horaires"), 8 fixed columns assembled at
  * `/root/reference/etl_meteo.py:53-66` (CSV path) and `:96-105` (JSON
  * path); documented in its `README.md:41-57`.
  *
  * `date_heure_utc` stays a string in the unified table (the reference
  * stores the raw text and only parses-with-coercion for audits,
  * `etl_meteo.py:127`); timestamp derivation is an audit-side concern.
  */
final case class WeatherObservation(
    date_heure_utc: String,
    temperature_c: Option[Double],
    humidite_pct: Option[Double],
    pression_hpa: Option[Double],
    vent_vitesse_ms: Option[Double],
    pluie_accum_mm: Option[Double],
    id_station: String,
    source_donnees: String)

object WeatherSchema {

  /** Column order matches the reference's final projection (etl_meteo.py:66). */
  val columns: Seq[String] = Seq(
    "date_heure_utc", "temperature_c", "humidite_pct", "pression_hpa",
    "vent_vitesse_ms", "pluie_accum_mm", "id_station", "source_donnees")

  /** The "numeric fields" subset every audit iterates (etl_meteo.py:37). */
  val numericFields: Seq[String] = Seq(
    "temperature_c", "humidite_pct", "pression_hpa",
    "vent_vitesse_ms", "pluie_accum_mm")

  val schema: StructType = StructType(Seq(
    StructField("date_heure_utc", StringType),
    StructField("temperature_c", DoubleType),
    StructField("humidite_pct", DoubleType),
    StructField("pression_hpa", DoubleType),
    StructField("vent_vitesse_ms", DoubleType),
    StructField("pluie_accum_mm", DoubleType),
    StructField("id_station", StringType),
    StructField("source_donnees", StringType)))

  val SourceWu = "Weather Underground"
  val SourceInfoclimat = "Infoclimat"

  /** Physical-range constraints from the reference's quality audit
    * (`quality_audit.py:11-16`): field → (min, max).
    */
  val qualityConstraints: Seq[(String, Double, Double)] = Seq(
    ("temperature_c", -50.0, 50.0),
    ("humidite_pct", 0.0, 100.0),
    ("pression_hpa", 800.0, 1100.0),
    ("vent_vitesse_ms", 0.0, 50.0))
}
