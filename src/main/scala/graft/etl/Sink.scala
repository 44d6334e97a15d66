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

  /** Incremental upsert: merge `updates` into the sink by `keys`, latest
    * row per key wins by `orderCol` (ties → update wins). The incremental
    * upgrade of the reference's full truncate-and-reload: only one
    * read+window pass over existing∪updates instead of re-ingesting every
    * source. Write goes through a temp dir then swaps, so a mid-write
    * failure leaves the old sink intact.
    */
  def upsert(updates: DataFrame, keys: Seq[String], orderCol: String): Long = {
    import org.apache.spark.sql.functions._
    val spark = updates.sparkSession
    val existing =
      try Some(read(spark)) catch { case _: Exception => None }
    val tagged = existing match {
      case Some(old) => old.withColumn("__src", lit(0))
        .unionByName(updates.withColumn("__src", lit(1)))
      case None => updates.withColumn("__src", lit(1))
    }
    val merged = graft.operators.Dedup.keepFirst(tagged, keys,
      Seq(col(orderCol).desc, col("__src").desc)).drop("__src")
    val tmp = path + ".__tmp"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = new java.io.File(stripScheme(path))
    val tmpFile = new java.io.File(stripScheme(tmp))
    if (fs.exists()) org.apache.commons.io.FileUtils.deleteDirectory(fs)
    if (!tmpFile.renameTo(fs))
      throw new java.io.IOException(s"upsert swap failed: $tmp -> $path")
    spark.read.parquet(path).count()
  }

  private def stripScheme(p: String): String =
    if (p.startsWith("file:")) p.stripPrefix("file:") else p

  /** Compact the sink to ~`targetFiles` files per partition directory —
    * small-file management for repeatedly-upserted/streamed sinks (1000s
    * of tiny parquet files destroy scan throughput at scale).
    */
  def compact(spark: SparkSession, targetFiles: Int): Long = {
    val df = read(spark).repartition(targetFiles)
    val tmp = path + ".__compact"
    val writer = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer).parquet(tmp)
    val fs = new java.io.File(stripScheme(path))
    val tmpFile = new java.io.File(stripScheme(tmp))
    org.apache.commons.io.FileUtils.deleteDirectory(fs)
    if (!tmpFile.renameTo(fs))
      throw new java.io.IOException(s"compact swap failed: $tmp -> $path")
    spark.read.parquet(path).count()
  }
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
