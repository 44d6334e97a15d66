package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The Python falsy-gate semantics of the JSON path (SURVEY §2 S6/S7/S9,
  * FIXTURES §2 edge cases), asserted record-by-record.
  */
class InfoclimatSemanticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def load(json: String): Map[String, org.apache.spark.sql.Row] = {
    val f = Files.createTempFile("infoclimat", ".json")
    Files.write(f, json.getBytes(StandardCharsets.UTF_8))
    InfoclimatJsonSource.read(spark, f.toString)
      .collect().map(r => r.getAs[String]("date_heure_utc") -> r).toMap
  }

  test("S9/S6/S7 falsy gates, shape guards, key fallback") {
    val rows = load(
      """{"hourly": {
        |  "07015": [
        |    {"id_station": "07015", "dh_utc": "2024-10-01 00:00:00",
        |     "temperature": "12.4", "pression": "1015.2", "humidite": "93",
        |     "vent_moyen": "14.8", "pluie_1h": "0", "pluie_3h": "0.2"},
        |    {"dh_utc": "2024-10-01 01:00:00", "temperature": "",
        |     "humidite": null, "vent_moyen": "", "pluie_3h": "0.7"},
        |    {"dh_utc": "2024-10-01 02:00:00", "temperature": "5.5",
        |     "pluie_1h": "", "pluie_3h": "9.9"},
        |    "not-a-dict",
        |    {"temperature": "9.9"}
        |  ],
        |  "badstation": "not-a-list"
        |}}""".stripMargin)

    assert(rows.size == 3) // shapeless + dh_utc-less records dropped

    val r0 = rows("2024-10-01 00:00:00")
    assert(r0.getAs[Double]("temperature_c") == 12.4)
    assert(r0.getAs[Double]("humidite_pct") == 93.0)
    assert(math.abs(r0.getAs[Double]("vent_vitesse_ms") - 14.8 / 3.6) < 1e-9)
    assert(r0.getAs[Double]("pluie_accum_mm") == 0.0) // "0" present → 0, no fallback
    assert(r0.getAs[String]("id_station") == "07015")

    val r1 = rows("2024-10-01 01:00:00")
    assert(r1.isNullAt(r1.fieldIndex("temperature_c")))    // '' → null
    assert(r1.isNullAt(r1.fieldIndex("humidite_pct")))     // null → null
    assert(r1.getAs[Double]("vent_vitesse_ms") == 0.0)     // '' → 0
    assert(r1.getAs[Double]("pluie_accum_mm") == 0.7)      // absent p1 → p3
    assert(r1.getAs[String]("id_station") == "07015")      // map-key fallback

    val r2 = rows("2024-10-01 02:00:00")
    // present-but-'' pluie_1h → 0.0 WITHOUT consulting pluie_3h (etl_meteo.py:93)
    assert(r2.getAs[Double]("pluie_accum_mm") == 0.0)
    assert(r2.getAs[Double]("vent_vitesse_ms") == 0.0)     // absent → 0
  }
}
