package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

/** Synthesizer for sf-scaled weather fixtures, shaped exactly like the
  * reference's inputs (FIXTURES.md): latin-1 `;`-CSV per (station, day)
  * with a units row and a summary row (`etl_meteo.py:16-33,156`), plus one
  * nested Infoclimat JSON (`etl_meteo.py:83-102`). The golden suite runs
  * the reference's own 4,936-row workload; THIS generator scales the same
  * shapes to bench the full pipeline at driver scale factors — more
  * station-day FILES and more rows per file, the way a real multi-station
  * deployment grows.
  *
  * Deterministic output (row content is a pure function of indices), so
  * bench runs are comparable across rounds.
  */
object EtlScaleFixtures {

  val dates: Seq[String] = (1 to 7).map(d => f"2024-10-0$d")

  /** One station-day CSV, `rows` data rows (valid, quality-clean). */
  private def writeCsv(dir: Path, station: String, date: String,
      rows: Int): CsvManifestEntry = {
    val sb = new StringBuilder
    sb ++= "Time;Temperature;Dew Point;Humidity ;Wind;Speed;Gust;Pressure;Precip. Rate.;Precip. Accum. ;UV;Solar\n"
    sb ++= "12:00 AM;55,6 °F;53,2 °F;92 %;SSW;4,5 mph;6,7 mph;29,82 in;0,00 in;0,00 in;0;0 w/m²\n"
    // physical row 2: the units row pandas skiprows=[2] drops
    sb ++= "(°F);(°F);(%);;(mph);(mph);(in);(in);(in);;(w/m²)\n"
    (1 until rows).foreach { i =>
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

  /** Nested Infoclimat JSON: `stations` map entries × `recordsPerStation`
    * records, with the reference's rain-key ladder cases cycled in.
    */
  private def writeJson(dir: Path, stations: Int, recordsPerStation: Int): String = {
    def station(id: String): String = {
      val recs = (0 until recordsPerStation).map { i =>
        val rain = i % 3 match {
          case 0 => """"pluie_1h": "0.2", "pluie_3h": "0.9""""
          case 1 => """"pluie_1h": "", "pluie_3h": "0.5""""
          case _ => """"pluie_3h": "0.4""""
        }
        s"""{"id_station": "$id", "dh_utc": "2024-10-0${1 + i % 7} ${f"${i % 24}%02d"}:00:00",
           | "temperature": "${10 + i % 8}.5", "pression": "1013.${i % 9}",
           | "humidite": "${70 + i % 25}", "vent_moyen": "${i % 30}.6", $rain}""".stripMargin
      }
      recs.mkString("[", ",", "]")
    }
    val body = (0 until stations)
      .map(sIdx => f"\"${70000 + sIdx}%05d\": ${station(f"${70000 + sIdx}%05d")}")
      .mkString(",\n  ")
    val json = s"""{"hourly": {\n  $body\n}}"""
    val f = dir.resolve("infoclimat.json")
    Files.write(f, json.getBytes(StandardCharsets.UTF_8))
    f.toString
  }

  final case class ScaledFixtures(
      manifests: Map[String, Seq[CsvManifestEntry]],
      jsonPath: String,
      expectedRows: Long)

  /** Synthesize `csvStations` stations × 7 days of CSVs with
    * `rowsPerFile` physical data rows each (first of which is the header
    * example row; the units + summary rows are dropped by the pipeline),
    * plus a JSON with `jsonStations` × `jsonRecords` records. Returns the
    * manifests keyed by station id and the expected unified row count.
    */
  def synthesize(baseDir: String, csvStations: Int, rowsPerFile: Int,
      jsonStations: Int, jsonRecords: Int): ScaledFixtures = {
    val dir = Paths.get(baseDir)
    if (Files.exists(dir)) {
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { Files.delete(p); () })
    }
    Files.createDirectories(dir)
    val manifests = (0 until csvStations).map { sIdx =>
      val id = f"st${sIdx}%04d"
      id -> dates.map(writeCsv(dir, id, _, rowsPerFile))
    }.toMap
    val jsonPath = writeJson(dir, jsonStations, jsonRecords)
    val expected = csvStations.toLong * dates.size * rowsPerFile +
      jsonStations.toLong * jsonRecords
    ScaledFixtures(manifests, jsonPath, expected)
  }
}
