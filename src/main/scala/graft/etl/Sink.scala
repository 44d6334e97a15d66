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
    // ONLY absence means "start empty" — a read failure on an existing
    // path must abort, or a transiently-unreadable sink would be silently
    // replaced by just the update batch
    val existing =
      if (new java.io.File(localPath).exists()) Some(read(spark)) else None
    val tagged = existing match {
      case Some(old) => old.withColumn("__src", lit(0))
        .unionByName(updates.withColumn("__src", lit(1)))
      case None => updates.withColumn("__src", lit(1))
    }
    val merged = graft.operators.Dedup.keepFirst(tagged, keys,
      Seq(col(orderCol).desc, col("__src").desc)).drop("__src")
    swapInto(merged)
    spark.read.parquet(path).count()
  }

  /** Compact the sink to ~`targetFiles` files per partition directory —
    * small-file management for repeatedly-upserted/streamed sinks (1000s
    * of tiny parquet files destroy scan throughput at scale).
    */
  def compact(spark: SparkSession, targetFiles: Int): Long = {
    swapInto(read(spark).repartition(targetFiles))
    spark.read.parquet(path).count()
  }

  private def localPath: String =
    if (path.startsWith("file:")) path.stripPrefix("file:") else path

  /** Write `df` to a temp dir, then swap it in (old → .__old, tmp → path,
    * drop .__old). Local-filesystem only (java.io swap; object stores /
    * HDFS need a committer-based sink) and not crash-atomic — the window
    * is the two renames, and `.__old` retains the previous data for
    * manual recovery if interrupted. Honors `partitionBy` so the sink's
    * layout survives rewrites.
    */
  private def swapInto(df: DataFrame): Unit = {
    require(!path.contains("://") || path.startsWith("file://"),
      s"swap-based rewrite supports local paths only, got $path")
    val tmp = path + ".__tmp"
    val writer = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer).parquet(tmp)
    val dst = new java.io.File(localPath)
    val tmpFile = new java.io.File(localPath + ".__tmp")
    val oldFile = new java.io.File(localPath + ".__old")
    if (oldFile.exists()) org.apache.commons.io.FileUtils.deleteDirectory(oldFile)
    if (dst.exists() && !dst.renameTo(oldFile))
      throw new java.io.IOException(s"swap failed moving old sink aside: $path")
    if (!tmpFile.renameTo(dst))
      throw new java.io.IOException(s"swap failed: $tmp -> $path")
    if (oldFile.exists()) org.apache.commons.io.FileUtils.deleteDirectory(oldFile)
  }
}

/** Typed sink-connectivity failure — the engine's equivalent of pymongo's
  * `ConnectionFailure` branch (`etl_meteo.py:213-215`): connection problems
  * are a distinct, catchable failure mode, not a generic exception.
  */
final class SinkConnectionFailure(msg: String) extends RuntimeException(msg)

/** Load failed post-write reconciliation (source count != target count —
  * the reference's "ÉCHEC" report branch, `etl_meteo.py:203-207`).
  */
final class SinkReconciliationError(val source: Long, val target: Long)
  extends RuntimeException(s"source=$source target=$target")

/** Document-store sink speaking the reference's EXACT load protocol
  * (`etl_meteo.py:182-218`) through the same trait, file-backed because
  * no store connector exists offline:
  *
  *   reference                    | here
  *   ---------------------------- | -----------------------------------
  *   MongoClient(uri, 5000ms)     | constructor path
  *   client.admin.command('ping') | ping() — storage reachable/writable
  *   collection.delete_many({})   | deleteMany() — truncate collection dir
  *   collection.insert_many(docs) | insertMany(df) — append JSONL batch
  *   collection.count_documents() | countDocuments()
  *   source-vs-target count check | overwrite() reconcile, typed error
  *   ConnectionFailure branch     | SinkConnectionFailure
  *
  * `quality_audit.py:20-30` (read the collection back and audit it) is
  * `read()`. Documents are JSON lines, the closest file form of a BSON
  * collection. If a mongo-spark-connector ever becomes available, a
  * MongoSink implements this same trait with these verbs mapped 1:1.
  */
final class DocumentStoreSink(collectionPath: String) extends Sink {

  private def dir = new java.io.File(
    if (collectionPath.startsWith("file:")) collectionPath.stripPrefix("file:")
    else collectionPath)

  /** Connectivity check (the `ping` admin command): parent storage must
    * exist and be writable. Throws [[SinkConnectionFailure]], the typed
    * path the reference reserves for ConnectionFailure.
    */
  def ping(): Unit = {
    val parent = dir.getAbsoluteFile.getParentFile
    if (parent == null || !parent.exists() || !parent.canWrite)
      throw new SinkConnectionFailure(
        s"document store unreachable: ${dir.getAbsolutePath} (parent missing or read-only)")
  }

  /** Truncate the collection (delete_many({})). Returns docs removed —
    * pymongo's deleted_count, which here costs a read of the dying data;
    * [[overwrite]] uses the count-free [[truncate]] instead.
    */
  def deleteMany(spark: SparkSession): Long = {
    val n = if (dir.exists()) countDocuments(spark) else 0L
    truncate()
    n
  }

  /** Truncate without the deleted_count read. */
  def truncate(): Unit =
    if (dir.exists()) org.apache.commons.io.FileUtils.deleteDirectory(dir)

  /** Batch insert (insert_many): append one JSONL batch. Returns batch size. */
  def insertMany(df: DataFrame): Long = {
    df.write.mode(SaveMode.Append).json(collectionPath)
    df.count()
  }

  /** count_documents({}) — 0 for a missing collection. */
  def countDocuments(spark: SparkSession): Long =
    if (!dir.exists()) 0L else read(spark).count()

  /** The reference's full load sequence: ping → delete_many → insert_many
    * → count_documents → source-vs-target reconciliation. A count mismatch
    * throws [[SinkReconciliationError]] (the report's ÉCHEC branch made a
    * hard failure rather than a log line).
    */
  override def overwrite(df: DataFrame): Long = {
    ping()
    val spark = df.sparkSession
    truncate() // count-free: the reference discards delete_many's count too
    // persist across the two source actions (write + count) so an
    // expensive upstream pipeline computes once, not twice
    df.persist()
    try {
      val source = insertMany(df)
      val target = countDocuments(spark)
      if (target != source) throw new SinkReconciliationError(source, target)
      target
    } finally df.unpersist()
  }

  override def read(spark: SparkSession): DataFrame = spark.read.json(collectionPath)
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

/** ORC sink (same contract; columnar alternative to parquet). */
final class OrcSink(path: String) extends Sink {
  override def overwrite(df: DataFrame): Long = {
    df.write.mode(SaveMode.Overwrite).orc(path)
    df.sparkSession.read.orc(path).count()
  }
  override def read(spark: SparkSession): DataFrame = spark.read.orc(path)
}
