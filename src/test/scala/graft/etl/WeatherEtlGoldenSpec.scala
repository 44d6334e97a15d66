package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** E2E golden parity test — the Spark port of the reference's
  * `test_etl_meteo.py` invariants, on synthesized fixtures shaped per
  * FIXTURES.md: 14 latin-1 `;`-CSV files (337 valid rows each, plus a
  * units row, a summary row) + 1 nested JSON (2 stations × 109 valid
  * records + malformed extras) = 4,936 unified rows, the reference's
  * golden count (test_etl_meteo.py:51).
  */
class WeatherEtlGoldenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dates = (1 to 7).map(d => f"2024-10-0$d")

  private def writeCsv(dir: Path, station: String, date: String): CsvManifestEntry = {
    val sb = new StringBuilder
    // stray whitespace in headers exercises the trim (etl_meteo.py:159)
    sb ++= "Time;Temperature;Dew Point;Humidity ;Wind;Speed;Gust;Pressure;Precip. Rate.;Precip. Accum. ;UV;Solar\n"
    sb ++= "12:00 AM;55,6 °F;53,2 °F;92 %;SSW;4,5 mph;6,7 mph;29,82 in;0,00 in;0,00 in;0;0 w/m²\n"
    // physical row 2: the units row pandas skiprows=[2] drops
    sb ++= "(°F);(°F);(%);;(mph);(mph);(in);(in);(in);;(w/m²)\n"
    (1 until 337).foreach { i =>
      val h = (i / 60) % 12
      val hh = if (h == 0) 12 else h
      val ampm = if ((i / 60) % 24 < 12) "AM" else "PM"
      val temp = 50 + (i % 20)
      sb ++= f"$hh%d:${i % 60}%02d $ampm;$temp%d,${i % 10}%d °F;50,0 °F;${60 + (i % 40)}%d %%;S;${i % 15}%d,3 mph;6,0 mph;29,${80 + (i % 15)}%d in;0,00 in;0,0${i % 9}%d in;0;${i % 800}%d w/m²\n"
    }
    sb ++= "Summary;;;;;;;;;;;\n" // non-time row dropped by F1/F2
    val f = dir.resolve(s"wu-$station-$date.csv")
    Files.write(f, sb.toString.getBytes(StandardCharsets.ISO_8859_1))
    CsvManifestEntry(f.toString, date)
  }

  private def writeJson(dir: Path): String = {
    def station(id: String, withIdField: Boolean): String = {
      val recs = (0 until 109).map { i =>
        val idPart = if (withIdField) s""""id_station": "$id", """ else ""
        val rain = i % 3 match {
          case 0 => """"pluie_1h": "0.2", "pluie_3h": "0.9""""   // p1 wins
          case 1 => """"pluie_1h": "", "pluie_3h": "0.5""""      // '' -> 0, no fallback
          case _ => """"pluie_3h": "0.4""""                      // absent p1 -> p3
        }
        s"""{$idPart"dh_utc": "2024-10-0${1 + i % 7} ${f"${i % 24}%02d"}:00:00",
           | "temperature": "${10 + i % 8}.5", "pression": "1013.${i % 9}",
           | "humidite": "${70 + i % 25}", "vent_moyen": "${i % 30}.6", $rain}""".stripMargin
      }
      // one shapeless record (skipped) + one record missing dh_utc (dropped)
      (recs :+ """"not-a-dict"""" :+ """{"temperature": "9.9"}""").mkString("[", ",", "]")
    }
    val json =
      s"""{"hourly": {
         |  "07015": ${station("07015", withIdField = true)},
         |  "07016": ${station("07016", withIdField = false)},
         |  "badstation": "not-a-list"
         |}}""".stripMargin
    val f = dir.resolve("infoclimat.json")
    Files.write(f, json.getBytes(StandardCharsets.UTF_8))
    f.toString
  }

  test("golden run: 4936 rows, invariants of test_etl_meteo.py") {
    val dir = Files.createTempDirectory("graft-fixtures")
    val madeleine = dates.map(writeCsv(dir, "madeleine", _))
    val ichtegem = dates.map(writeCsv(dir, "ichtegem", _))
    val jsonPath = writeJson(dir)
    val sinkPath = dir.resolve("sink").toString

    val result = WeatherPipeline.run(spark, madeleine, ichtegem,
      Some(jsonPath), new ParquetSink(sinkPath))

    // test_01: golden count (14×337 CSV + 2×109 JSON = 4936)
    assert(result.preLoad.totalRows == 4936L)
    assert(result.rowsWritten == 4936L)
    assert(result.countReconciled)
    // test_02: zero null temperatures
    assert(result.preLoad.nullCounts("temperature_c") == 0L)
    // test_03 analog: schema is typed (no strings in numeric fields)
    val sunk = spark.read.parquet(sinkPath)
    WeatherSchema.numericFields.foreach { f =>
      assert(sunk.schema(f).dataType.typeName == "double", f)
    }
    // test_04: date range within 2024-10-01..07
    assert(result.preLoad.minDate.get.contains("2024-10-01"))
    assert(result.preLoad.maxDate.get.contains("2024-10-07"))
    // quality_audit: 0% anomaly rate on clean fixtures
    assert(result.postLoad.totalAnomalies == 0L)
    assert(result.postLoad.errorRatePct == 0.0)
    // source split
    val bySource = sunk.groupBy("source_donnees").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource(WeatherSchema.SourceWu) == 4718L)
    assert(bySource(WeatherSchema.SourceInfoclimat) == 218L)
    // J1 map-key fallback: station without id_station field gets the key
    val stations = sunk.select("id_station").distinct().collect().map(_.getString(0)).toSet
    assert(stations == Set("1001", "1002", "07015", "07016"))
  }

  test("scaled-fixture synthesizer at 1x reproduces the golden workload through runMany") {
    val dir = Files.createTempDirectory("graft-etl-scale").toString
    val fx = EtlScaleFixtures.synthesize(dir, csvStations = 2, rowsPerFile = 337,
      jsonStations = 2, jsonRecords = 109)
    assert(fx.expectedRows == 4936L) // the reference's golden count at 1x
    val result = WeatherPipeline.runMany(spark, fx.manifests, Some(fx.jsonPath),
      new ParquetSink(dir + "/sink"))
    assert(result.rowsWritten == 4936L && result.countReconciled)
    assert(result.preLoad.nullCounts("temperature_c") == 0L)
    assert(result.postLoad.totalAnomalies == 0L)
  }

  test("golden run through DocumentStoreSink: same invariants over the reference's own protocol") {
    val dir = Files.createTempDirectory("graft-fixtures-doc")
    val madeleine = dates.map(writeCsv(dir, "madeleine", _))
    val ichtegem = dates.map(writeCsv(dir, "ichtegem", _))
    val jsonPath = writeJson(dir)
    val sink = new DocumentStoreSink(dir.resolve("donnees_horaires").toString)

    val result = WeatherPipeline.run(spark, madeleine, ichtegem, Some(jsonPath), sink)

    assert(result.preLoad.totalRows == 4936L)
    assert(result.rowsWritten == 4936L)       // count_documents reconciliation
    assert(result.countReconciled)
    assert(result.postLoad.totalAnomalies == 0L)
    // read-back (quality_audit.py path) sees all four stations
    val stations = sink.read(spark).select("id_station").distinct()
      .collect().map(_.getString(0)).toSet
    assert(stations == Set("1001", "1002", "07015", "07016"))
    // idempotent reload: a second full run leaves exactly one copy
    assert(sink.overwrite(WeatherPipeline.unified(spark, madeleine, ichtegem,
      Some(jsonPath))) == 4936L)
    assert(sink.countDocuments(spark) == 4936L)
  }

  test("missing CSV file is skipped with a warning, pipeline continues (R4)") {
    val dir = Files.createTempDirectory("graft-fixtures-r4")
    val good = writeCsv(dir, "x", "2024-10-01")
    val manifest = Seq(good, CsvManifestEntry(dir.resolve("absent.csv").toString, "2024-10-02"))
    val df = WuCsvSource.read(spark, manifest, "1001", WeatherSchema.SourceWu)
    assert(df.count() == 337L)
  }
}
