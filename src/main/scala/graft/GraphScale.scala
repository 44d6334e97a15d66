package graft

import org.apache.spark.sql.functions._

/** Dev measurement for the graph-iteration shuffle lever: does a
  * repartition(col) BEFORE the one-time eager localCheckpoint survive
  * into later joins (LogicalRDD preserves outputPartitioning), eliding
  * the edge-sized per-pass Exchange? Then: connectedComponents /
  * pageRank wall-clock on a synthetic multi-million-edge graph.
  * Usage: runMain graft.GraphScale [nEdges] [nNodes]
  */
object GraphScale {
  def main(args: Array[String]): Unit = {
    val nEdges = args.headOption.map(_.toLong).getOrElse(20000000L)
    val nNodes = args.drop(1).headOption.map(_.toLong).getOrElse(2000000L)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // --- plan check: partitioning preservation through localCheckpoint
    // (shuffle join forced — broadcast needs no distribution and would
    // make the check vacuous)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", -1)
    val base = spark.range(1000).select(
      (col("id") % 100).as("v"), col("id").as("payload"))
    // AQE's AdaptiveSparkPlanExec reports UnknownPartitioning until
    // execution, so an eager checkpoint under AQE captures nothing —
    // capture with AQE off for this one build
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val ck = base.repartition(col("v")).localCheckpoint(true)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val probe = spark.range(100).select(col("id").as("v"), lit(1).as("x"))
      .repartition(col("v"))
    val joined = ck.join(probe, Seq("v"))
    val plan = joined.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    println(s"[graph-scale] exchanges under join after ck+repartition: $exchanges")
    println(plan.linesIterator.filter(l =>
      l.contains("Exchange") || l.contains("LogicalRDD") || l.contains("Scan")).mkString("\n"))

    // --- synthetic graph: ~nEdges edges over nNodes vertices
    val edges = spark.range(nEdges).select(
      pmod(xxhash64(col("id")), lit(nNodes)).as("src"),
      pmod(xxhash64(col("id") + lit(nEdges)), lit(nNodes)).as("dst"))
      .filter(col("src") =!= col("dst"))
      .localCheckpoint(true)
    println(s"[graph-scale] edges: ${edges.count()}")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[graph-scale] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    time("connectedComponents") {
      val cc = graft.operators.Graph.connectedComponents(edges, "src", "dst")
      println(s"[graph-scale]   components: ${cc.select(col("component")).distinct().count()}")
    }
    time("pageRank x5") {
      val pr = graft.operators.Graph.pageRank(edges, "src", "dst", iterations = 5)
      println(s"[graph-scale]   pr rows: ${pr.count()}")
    }
    spark.stop()
  }
}
