package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Config choices (and why they matter at 100 TB):
  *  - AQE on: runtime re-planning (coalesce shuffle partitions, skew-join
  *    split, dynamic broadcast) is the main lever we have when static stats
  *    are wrong at scale.
  *  - ANSI off: the reference pipeline (etl_meteo.py:41-46,127) uses
  *    null-on-failure coercion everywhere (`errors='coerce'`, try/except →
  *    None). Non-ANSI casts replicate that; oracle SQL uses TRY_CAST.
  *  - UTC session timezone: deterministic timestamp semantics across the
  *    cluster and vs. the DuckDB oracle.
  *  - `nanosAsLong`: some rounds' events.parquet carried TIMESTAMP(NANOS)
  *    which Spark has no native type for; under this conf it reads as long
  *    nanos at full precision (see [[Tables.normalizeEvents]] — the loader
  *    is schema-adaptive and also accepts the current TIMESTAMP(MICROS)
  *    files). A double division would lose precision (2024 epoch-nanos
  *    ≈ 1.7e18 > 2^53), so conversions use integer `div`.
  *  - shuffle.partitions defaults to #cores locally; on a real cluster this
  *    is sized to ~2-3x total cores and AQE coalesces down.
  */
object GraftSession {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.ui.enabled", "false")

  /** Local session sized for this container (local[32], 32 shuffle parts). */
  def local(cores: Int = 32): SparkSession = {
    val s = builder(s"local[$cores]", cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    tune(s)
    s
  }

  /** Apply runtime-settable graft configs to an externally-created session
    * (e.g. the driver's Verify/Bench session). Safe to call repeatedly.
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark
  }

  /** Cluster-profile builder — the knobs that matter when this engine runs
    * against ~100 TB on a real cluster (documented here, harmless locally):
    *
    *  - `shuffle.partitions` ≈ 2-3 × total executor cores; AQE coalesces
    *    small partitions down, so err high — undersizing causes spill.
    *  - `files.maxPartitionBytes` 256 MB: fewer, fuller scan tasks against
    *    columnar parquet; with 100k+ files also raise
    *    `files.openCostInBytes` so tiny files batch into shared splits.
    *  - `autoBroadcastJoinThreshold` 64 MB: dims up to ~500 MB on-heap
    *    still broadcast profitably on 8 GB executors; beyond that prefer
    *    bucketed co-located joins (see GraftExtensionsSpec) over SMJ.
    *  - AQE skew-join on (default): hot keys split at runtime; for skewed
    *    AGGREGATIONS use [[graft.operators.SkewJoin.saltedCountByKey]].
    *  - `parquet.aggregatePushdown`: MIN/MAX/COUNT answered from footers.
    */
  def clusterBuilder(totalCores: Int): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.shuffle.partitions", totalCores * 3)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (256L * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (16L * 1024 * 1024).toString)
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
}
