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

  /** The engine's events contract: `ts` TimestampType at µs precision +
    * `ts_ns` long epoch-nanos. The driver's events.parquet has shipped
    * with BOTH physical timestamp encodings across rounds, so the
    * normalization is schema-adaptive:
    *   - parquet TIMESTAMP(NANOS) → Spark reads a long under
    *     `nanosAsLong`; keep it as ts_ns and derive ts by integer `div`
    *     (a double division would corrupt 1.7e18-scale values);
    *   - parquet TIMESTAMP(MICROS) (current testdata) → Spark reads
    *     TIMESTAMP_NTZ; the UTC session makes the NTZ→TIMESTAMP cast
    *     epoch-preserving, and ts_ns = µs·1000 (the file has no
    *     sub-µs precision, so every (ts_ns, id) ordering is unchanged
    *     and the DuckDB oracle sees identical epoch_us values).
    */
  def normalizeEvents(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ =>
        df.withColumn("ts",
            col("ts").cast(org.apache.spark.sql.types.TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeEvents(table(s, d, "events"))
}
