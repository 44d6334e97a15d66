package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.CleanValue._

/** One entry per source CSV: the reference enumerates 14 files in two
  * literal dicts keyed by date (`etl_meteo.py:16-33`); we model that as an
  * explicit manifest so the file→date mapping stays external to the data
  * (which at scale becomes Hive-style `date=` partitioning).
  */
final case class CsvManifestEntry(path: String, date: String)

/** Weather Underground per-(station, day) CSV source — SURVEY §2 R1/R2/R4.
  *
  * Reference read (`etl_meteo.py:156`): `;`-separated, latin-1, header row,
  * physical row 2 (a units row) skipped, header names trimmed (`:159`).
  * Spark CSV has no `skiprows`; the units row's cells fail numeric/time
  * parsing and its rows are dropped by the same `date_heure_utc IS NOT NULL`
  * filter that drops summary rows (`etl_meteo.py:59,64`) — byte-identical
  * outcome, no extra pass.
  */
object WuCsvSource {

  /** Columns the transform consumes (etl_meteo.py:53-59). */
  private val consumed = Seq("Time", "Temperature", "Humidity", "Pressure", "Speed", "Precip. Accum.")

  /** Read one file; returns None (skip-and-warn, R4) if absent/unreadable. */
  def readFile(spark: SparkSession, entry: CsvManifestEntry): Option[DataFrame] = {
    try {
      // Existence probe through the Hadoop FileSystem resolved for the
      // path's scheme — works for local, HDFS and object stores alike
      // (a bare java.io.File check would silently "miss" every non-local
      // path and skip real cluster files).
      val hPath = new org.apache.hadoop.fs.Path(entry.path)
      val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(hPath)) {
        System.err.println(s"[graft.etl] CSV missing, skipped: ${entry.path}")
        return None
      }
      val raw = spark.read
        .option("sep", ";")
        .option("encoding", "ISO-8859-1")
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .csv(entry.path)
      // Trim whitespace from header names (etl_meteo.py:159).
      val trimmed = raw.toDF(raw.columns.map(_.trim): _*)
      // Ensure all consumed columns exist (missing → null column) so a
      // malformed file degrades instead of erroring mid-plan.
      val withCols = consumed.foldLeft(trimmed) { (df, c) =>
        if (df.columns.contains(c)) df else df.withColumn(c, lit(null).cast(StringType))
      }
      Some(withCols.withColumn("file_date", lit(entry.date)))
    } catch {
      case e: Exception =>
        System.err.println(s"[graft.etl] CSV unreadable, skipped: ${entry.path}: ${e.getMessage}")
        None
    }
  }

  /** Read + transform + union a whole manifest for one station. */
  def read(spark: SparkSession, manifest: Seq[CsvManifestEntry],
           stationId: String, source: String): DataFrame = {
    val frames = manifest.flatMap(readFile(spark, _))
      .map(WeatherTransforms.fromWuCsv(_, stationId, source))
    frames match {
      case Nil => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], WeatherSchema.schema)
      case head +: tail => tail.foldLeft(head)(_.unionByName(_))
    }
  }

  /** The standard WU export layout (the headers every reference CSV
    * carries, trimmed — `etl_meteo.py:159`), as an explicit all-string
    * schema for the fleet path: with a schema, Spark maps columns
    * positionally and never reads headers at plan time.
    */
  val wuLayout: StructType = StructType(
    Seq("Time", "Temperature", "Dew Point", "Humidity", "Wind", "Speed",
      "Gust", "Pressure", "Precip. Rate.", "Precip. Accum.", "UV", "Solar")
      .map(StructField(_, StringType)))

  /** FLEET-SCALE read: every station's manifest in ONE csv scan.
    *
    * The per-file [[read]] path plans one scan + transform per file — at
    * 2×7 reference files that's fine; at a fleet's hundreds of
    * station-days the N-branch union (and the per-file header probe the
    * schema-less read needs) dominates wall clock and analyzer time
    * (measured: 14 files ≈ 15 s at sf0.01, plan-bound, not IO-bound).
    * Here all paths go into one multi-path FileScan with the explicit
    * [[wuLayout]] schema — one task per split regardless of file count —
    * and each row's (station, date) attaches from a BROADCAST manifest
    * lookup on the normalized `_metadata.file_path`. This is the "manifest
    * becomes partition metadata" scale shape the [[CsvManifestEntry]]
    * scaladoc promises.
    *
    * Contract vs [[read]]: assumes the dialect-uniform WU layout (true of
    * the reference fleet); R4 skip-and-warn runs as a driver-side
    * existence probe before the scan. Same-filesystem manifests (paths
    * compare scheme-stripped).
    */
  def readFleet(spark: SparkSession, manifests: Map[String, Seq[CsvManifestEntry]],
      source: String): DataFrame = {
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    def normalized(p: String): String = {
      val hPath = new org.apache.hadoop.fs.Path(p)
      hPath.getFileSystem(hadoopConf).makeQualified(hPath).toUri.getPath
    }
    val entries = manifests.toSeq.sortBy(_._1)
      .flatMap { case (st, m) => m.map(e => (st, e)) }
    val (present, missing) = entries.partition { case (_, e) =>
      val hPath = new org.apache.hadoop.fs.Path(e.path)
      hPath.getFileSystem(hadoopConf).exists(hPath)
    }
    missing.foreach { case (_, e) =>
      System.err.println(s"[graft.etl] CSV missing, skipped: ${e.path}")
    }
    if (present.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], WeatherSchema.schema)
    // scan each DISTINCT path once: a file listed under two manifest
    // entries must yield one scanned copy per ENTRY via the lookup join
    // (the read() equivalence) — scanning it once per entry would
    // square the copies
    val raw = spark.read
      .option("sep", ";")
      .option("encoding", "ISO-8859-1")
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .schema(wuLayout)
      .csv(present.map(_._2.path).distinct: _*)
      // normalize to the AUTHORITY-LESS path, matching normalized()'s
      // toUri.getPath on the lookup side — keeping the authority here
      // (hdfs://nn:8020/…, s3a://bucket/…) made the join match NOTHING
      // on any filesystem whose URIs carry one: silent zero-row reads.
      // (Residual limit: percent-encoded metadata paths vs decoded
      // getPath — paths with spaces etc.; the reference fleet has none.)
      .withColumn("__fp",
        regexp_replace(col("_metadata.file_path"),
          "^[a-zA-Z0-9+.-]+:(//[^/]*)?", ""))
    val lookup = spark.createDataFrame(
      present.map { case (st, e) => (normalized(e.path), st, e.date) })
      .toDF("__fp", "__station", "file_date")
    val joined = raw.join(broadcast(lookup), Seq("__fp"))
    WeatherTransforms.fromWuCsv(joined, col("__station"), source)
  }
}

/** Infoclimat whole-file nested JSON source — SURVEY §2 R3 + J1/J2.
  *
  * Source shape (`etl_meteo.py:83,88,147`): one document with key `hourly`:
  * a map station_id → array<record>. The reference skips non-list station
  * payloads and non-dict records with a warning (`etl_meteo.py:84-90`). To
  * replicate *per-station* skip semantics (not whole-file corruption), the
  * map values are first read as raw JSON strings, then each station's
  * payload is `from_json`'d individually — a malformed station yields null
  * and is filtered, leaving the others intact.
  */
object InfoclimatJsonSource {

  /** All metric fields kept as strings: the reference applies Python falsy
    * gates to raw values ('' vs null vs missing — etl_meteo.py:92-102);
    * typing happens in the transform, not the scan.
    */
  val recordSchema: StructType = StructType(Seq(
    StructField("id_station", StringType),
    StructField("dh_utc", StringType),
    StructField("temperature", StringType),
    StructField("pression", StringType),
    StructField("humidite", StringType),
    StructField("vent_moyen", StringType),
    StructField("pluie_1h", StringType),
    StructField("pluie_3h", StringType)))

  /** Exploded raw records: one row per (station key, record struct).
    *
    * Two-stage parse: the station payload is first split into an array of
    * raw JSON element strings, non-object elements are filtered (the
    * reference's "skip non-dict record", etl_meteo.py:89-90), and only
    * then is each object parsed against [[recordSchema]]. Parsing the
    * whole array against `ArrayType(recordSchema)` directly would null the
    * entire station when ONE element is shapeless (PERMISSIVE fails the
    * full value) — the reference skips only the bad record.
    */
  def readRaw(spark: SparkSession, path: String): DataFrame = {
    val topSchema = StructType(Seq(
      StructField("hourly", MapType(StringType, StringType))))
    val doc = spark.read.option("multiLine", "true").schema(topSchema).json(path)
    doc
      .select(explode_outer(col("hourly")).as(Seq("station_key", "payload")))
      // F3: non-array station payloads (e.g. a bare string) are skipped.
      .filter(col("payload").isNotNull && col("payload").startsWith("["))
      .select(col("station_key"),
        explode(from_json(col("payload"), ArrayType(StringType))).as("elem"))
      // F3: keep only JSON objects (reference's isinstance(record, dict))
      .filter(col("elem").isNotNull && col("elem").startsWith("{"))
      .select(col("station_key"), from_json(col("elem"), recordSchema).as("r"))
      .filter(col("r").isNotNull)
      .select(col("station_key"), col("r.*"))
  }

  def read(spark: SparkSession, path: String): DataFrame =
    try {
      val out = WeatherTransforms.fromInfoclimatJson(readRaw(spark, path))
      // R3 skip-and-warn must cover TASK-time failures too (corrupt gz,
      // permissions): with an explicit schema nothing touches file
      // contents until an action, so probe one row HERE — otherwise the
      // error escapes to the middle of the pipeline run instead of this
      // typed skip (one small job over a single document file)
      out.limit(1).collect(): Unit
      out
    } catch {
      case e: Exception =>
        System.err.println(s"[graft.etl] JSON unreadable, skipped: $path: ${e.getMessage}")
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], WeatherSchema.schema)
    }
}
