package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's synthetic TPC-H-ish tables (TESTDATA.md).
  *
  * All loads are plain parquet scans — column pruning and predicate pushdown
  * reach the scan automatically because callers compose on the returned
  * (lazy) DataFrame.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    GraftSession.tune(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** events.parquet stores ts as parquet TIMESTAMP(NANOS), which Spark can
    * only read as a long (spark.sql.legacy.parquet.nanosAsLong). We expose:
    *   - ts_ns: long epoch-nanos (full precision, used for ordering)
    *   - ts:    TimestampType truncated to microseconds (integer `div` —
    *            a double division would corrupt 1.7e18-scale values)
    */
  def events(s: SparkSession, d: String): DataFrame =
    table(s, d, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
}
