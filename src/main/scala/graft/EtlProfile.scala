package graft

import org.apache.spark.sql.functions._

/** Dev profiling harness for the ETL lane (round-9 verdict #6: at sf1
  * `etl_pipeline` is the slowest single bench entry — attribute the
  * cost before optimizing). Synthesizes the SAME fixtures Bench uses at
  * a given workload multiple and times each leg separately:
  * CSV fleet scan, JSON leg, unified transform, full pipeline, and the
  * parse floors (raw CSV count, parquet round-trip of the same rows).
  *
  * Usage: runMain graft.EtlProfile <workloadMultiple e.g. 1000 for sf1>
  */
object EtlProfile {
  def main(args: Array[String]): Unit = {
    import graft.etl._
    val s = args.headOption.flatMap(_.toDoubleOption).getOrElse(1000.0)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS")
      .flatMap(_.toIntOption).getOrElse(32)
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)
    val mult = math.min(s, 10.0).toInt
    val stations = math.max(2, math.round(2 * s / 10).toInt)
    val tmp = sys.props("java.io.tmpdir")
    val fx = EtlScaleFixtures.synthesize(s"$tmp/graft_etl_profile",
      stations, 337 * mult, stations, 109 * mult)
    def timed(name: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[etl-profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
      n
    }
    // warmup at golden scale (JIT/codegen/CSV-parser setup)
    val warm = EtlScaleFixtures.synthesize(s"$tmp/graft_etl_profile_warm", 2, 337, 2, 109)
    WeatherPipeline.runMany(spark, warm.manifests, Some(warm.jsonPath),
      new ParquetSink(s"$tmp/graft_etl_profile_warm_sink")): Unit
    (1 to 2).foreach { pass =>
      println(s"[etl-profile] pass $pass (s=$s stations=$stations mult=$mult)")
      timed("raw csv scan floor") {
        val paths = fx.manifests.values.flatten.map(_.path).toSeq
        spark.read.option("sep", ";").option("encoding", "ISO-8859-1")
          .option("header", "true").schema(WuCsvSource.wuLayout)
          .csv(paths: _*).count()
      }
      timed("csv fleet scan+transform") {
        WuCsvSource.readFleet(spark, fx.manifests, WeatherSchema.SourceWu).count()
      }
      timed("json leg") {
        InfoclimatJsonSource.read(spark, fx.jsonPath).count()
      }
      timed("unified (no sink)") {
        WeatherPipeline.unifiedMany(spark, fx.manifests, Some(fx.jsonPath)).count()
      }
      timed("full pipeline") {
        WeatherPipeline.runMany(spark, fx.manifests, Some(fx.jsonPath),
          new ParquetSink(s"$tmp/graft_etl_profile_sink")).rowsWritten
      }
      timed("parquet round-trip floor") {
        val p = s"$tmp/graft_etl_profile_pq"
        if (pass == 1) {
          WeatherPipeline.unifiedMany(spark, fx.manifests, Some(fx.jsonPath))
            .write.mode("overwrite").parquet(p)
        }
        spark.read.parquet(p).count()
      }
    }
    spark.stop()
  }
}
