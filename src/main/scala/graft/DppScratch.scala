package graft

import org.apache.spark.sql.functions._

/** Dev probe: does dynamic partition pruning fire on the persisted
  * LSH `bands/band=/key=` layout when the probe band-key frame is
  * broadcast-joined instead of collected into an OR-chain literal?
  */
object DppScratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    import spark.implicits._
    val tmp = System.getProperty("java.io.tmpdir")
    val path = s"$tmp/graft_dpp_scratch"

    // a small partitioned layout shaped like writeLshIndex's bands/
    (0 until 10000).map(i => (i.toLong, i % 15, (i % 16).toLong))
      .toDF("id", "band", "key")
      .write.mode("overwrite").partitionBy("band", "key")
      .parquet(s"$path/bands")

    // probe side: small frame WITH a selective filter in its lineage,
    // parquet-backed like the real eval frame (a local Seq collapses to
    // LocalRelation and loses the Filter node DPP needs)
    (0 until 40).map(i => (1000L + i, i % 15, (i % 3).toLong, i.toDouble))
      .toDF("probe_id", "band", "key", "nrm")
      .write.mode("overwrite").parquet(s"$path/probes")
    val probes = spark.read.parquet(s"$path/probes")
      .filter(col("nrm") >= 0.0)
      .select("probe_id", "band", "key")

    val cand = spark.read.parquet(s"$path/bands")
      .join(broadcast(probes), Seq("band", "key"))
    println("rows=" + cand.count())
    val planned = cand.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    println("=== planned contains dynamicpruning: " +
      planned.contains("dynamicpruning"))
    println(planned.split("\n").filter(l =>
      l.contains("PartitionFilters") || l.contains("Subquery") ||
      l.contains("dynamic")).mkString("\n"))
    val finalPlan = cand.queryExecution.executedPlan.toString
    println("=== final contains dynamicpruning: " +
      finalPlan.contains("dynamicpruning"))
    finalPlan.split("\n").filter(_.contains("PartitionFilters"))
      .foreach(l => println("FINAL: " + l.take(400)))
    spark.stop()
  }
}
