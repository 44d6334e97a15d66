package graft

/** Dev tool: idle-gated median-of-N re-pin for specific bench queries
  * (r7 verdict #2 — q260/q34 medians doubled on unchanged code; this
  * separates host noise from regression without paying a full suite).
  * Usage: runMain graft.BenchPin <sfDir> <passes> <query> [<query>...]
  */
object BenchPin {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val passes = args(1).toInt
    val names = args.drop(2)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS")
      .flatMap(_.toIntOption).getOrElse(32)
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)
    def loadAvg(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    // idle gate: wait up to 180 s for loadavg < 4
    var waited = 0
    while (loadAvg() > 4.0 && waited < 180) { Thread.sleep(5000); waited += 5 }
    println(f"[pin] loadavg=${loadAvg()}%.2f idle_wait=${waited}s passes=$passes sf=$sfDir")
    names.foreach { name =>
      def run(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // warmup
      val runs = Seq.fill(passes)(run()).sorted
      val median = if (runs.size % 2 == 1) runs(runs.size / 2)
        else (runs(runs.size / 2 - 1) + runs(runs.size / 2)) / 2
      println(f"[pin] $name median=$median%.3f runs=${runs.map(r => f"$r%.3f").mkString(",")} loadavg_end=${loadAvg()}%.2f")
    }
    spark.stop()
  }
}
