package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Sink abstraction — SURVEY §2 W1-W3.
  *
  * The reference's load is truncate-and-reload into MongoDB with a
  * post-write count reconciliation (`etl_meteo.py:182-218`: delete_many →
  * insert_many → count_documents). `SaveMode.Overwrite` gives the same
  * full-overwrite, idempotent semantics; `verifyCount` is W2.
  */
trait Sink {
  /** Full-overwrite write (W1). Returns rows written. */
  def overwrite(df: DataFrame): Long
  /** Read the sink back (for W2 reconciliation and downstream audits). */
  def read(spark: SparkSession): DataFrame
}

/** Parquet sink, optionally Hive-partitioned (the scale path: the
  * reference's external file→date map, etl_meteo.py:161-162, becomes real
  * partition pruning under `date=`/`id_station=` directories).
  */
final class ParquetSink(path: String, partitionBy: Seq[String] = Nil) extends Sink {

  override def overwrite(df: DataFrame): Long = {
    val writer = df.write.mode(SaveMode.Overwrite)
    val partitioned = if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer
    partitioned.parquet(path)
    df.sparkSession.read.parquet(path).count()
  }

  override def read(spark: SparkSession): DataFrame = spark.read.parquet(path)

  /** W2: post-write count reconciliation (etl_meteo.py:200-207). */
  def verifyCount(spark: SparkSession, expected: Long): Boolean =
    read(spark).count() == expected
}

/** CSV sink (interchange/export path; same overwrite + reconcile contract). */
final class CsvSink(path: String, sep: String = ";") extends Sink {
  override def overwrite(df: DataFrame): Long = {
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true").option("sep", sep).csv(path)
    df.sparkSession.read.option("header", "true").csv(path).count()
  }
  override def read(spark: SparkSession): DataFrame =
    spark.read.option("header", "true").option("sep", sep).csv(path)
}

/** JSON-lines sink (same contract). */
final class JsonSink(path: String) extends Sink {
  override def overwrite(df: DataFrame): Long = {
    df.write.mode(SaveMode.Overwrite).json(path)
    df.sparkSession.read.json(path).count()
  }
  override def read(spark: SparkSession): DataFrame = spark.read.json(path)
}
