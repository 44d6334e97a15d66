package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end pipeline — the Spark re-expression of `run_full_etl`
  * (`etl_meteo.py:292-332`): extract both sources, union, audit, load,
  * post-load audit.
  *
  * Unlike the reference (fully-materialized list-of-dicts between every
  * phase, etl_meteo.py:295-311), each phase here composes lazily on one
  * logical plan; nothing materializes until the sink write / audit actions,
  * and the audits are single-pass aggregations.
  */
final case class PipelineResult(
    rowsWritten: Long,
    preLoad: IntegrityReport,
    postLoad: QualityReport,
    countReconciled: Boolean)

object WeatherPipeline {

  /** Build the unified (pre-sink) DataFrame: CSV stations + JSON, unioned. */
  def unified(
      spark: SparkSession,
      madeleineManifest: Seq[CsvManifestEntry],
      ichtegemManifest: Seq[CsvManifestEntry],
      jsonPath: Option[String]): DataFrame = {
    val madeleine = WuCsvSource.read(spark, madeleineManifest, "1001", WeatherSchema.SourceWu)
    val ichtegem = WuCsvSource.read(spark, ichtegemManifest, "1002", WeatherSchema.SourceWu)
    val json = jsonPath.map(InfoclimatJsonSource.read(spark, _))
    (Seq(madeleine, ichtegem) ++ json).reduce(_.unionByName(_))
  }

  /** N-station generalization of [[unified]]: one manifest per station id
    * (the reference hardcodes its two stations, `etl_meteo.py:297-301`;
    * a deployment has hundreds). Same per-file skip-and-warn, same
    * transform, one unioned plan.
    */
  def unifiedMany(
      spark: SparkSession,
      manifests: Map[String, Seq[CsvManifestEntry]],
      jsonPath: Option[String]): DataFrame = {
    val csv = WuCsvSource.readFleet(spark, manifests, WeatherSchema.SourceWu)
    val json = jsonPath.map(InfoclimatJsonSource.read(spark, _))
    (Seq(csv) ++ json).reduce(_.unionByName(_))
  }

  /** Full pipeline over N station manifests — extract → audit → load →
    * reconcile → post-audit, the `run_full_etl` phase structure at fleet
    * scale.
    */
  def runMany(
      spark: SparkSession,
      manifests: Map[String, Seq[CsvManifestEntry]],
      jsonPath: Option[String],
      sink: Sink): PipelineResult =
    runOn(unifiedMany(spark, manifests, jsonPath), spark, sink)

  def run(
      spark: SparkSession,
      madeleineManifest: Seq[CsvManifestEntry],
      ichtegemManifest: Seq[CsvManifestEntry],
      jsonPath: Option[String],
      sink: Sink): PipelineResult =
    runOn(unified(spark, madeleineManifest, ichtegemManifest, jsonPath), spark, sink)

  private def runOn(df: DataFrame, spark: SparkSession, sink: Sink): PipelineResult = {
    df.cache() // two actions follow (audit + write); one scan of the sources
    try {
      val pre = IntegrityReport.compute(df)         // PHASE 3 (etl_meteo.py:323)
      val written = sink.overwrite(df)              // PHASE 4 (:326)
      val reconciled = written == pre.totalRows     // W2 (:200-207)
      val post = QualityAudit.compute(sink.read(spark)) // audit (:330)
      PipelineResult(written, pre, post, reconciled)
    } finally df.unpersist()
  }
}
