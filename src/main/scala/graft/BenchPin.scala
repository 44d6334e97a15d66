package graft

/** Dev tool: idle-gated median-of-N re-pin for specific bench queries
  * (r7 verdict #2 — q260/q34 medians doubled on unchanged code; this
  * separates host noise from regression without paying a full suite).
  *
  * Round-9 (r8 verdict #4): per-run TASK TELEMETRY via a
  * SparkListener — memory/disk spill, GC time, peak execution memory,
  * shuffle read/write bytes — so an outlier run (q111's 67 s third run
  * at sf10) is attributable to spill vs host contention from the
  * artifact alone. Emits one machine-readable JSON line
  * (`"detail":"bench_pin"`) after the human-readable [pin] lines.
  *
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
    val listener = new TaskMetricsListener
    spark.sparkContext.addSparkListener(listener)
    def loadAvg(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    // idle gate: wait (default up to 180 s, SPARK_GRAFT_IDLE_WAIT to
    // override — sf10 reruns use longer) for loadavg < 4
    val maxWait = sys.env.get("SPARK_GRAFT_IDLE_WAIT")
      .flatMap(_.toIntOption).getOrElse(180)
    var waited = 0
    while (loadAvg() > 4.0 && waited < maxWait) { Thread.sleep(5000); waited += 5 }
    println(f"[pin] loadavg=${loadAvg()}%.2f idle_wait=${waited}s passes=$passes sf=$sfDir")
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val medians = scala.collection.mutable.LinkedHashMap[String, Double]()
    val raws = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val tele = scala.collection.mutable.LinkedHashMap[String, Seq[Seq[Double]]]()
    names.foreach { name =>
      def run(): (Double, Seq[Double]) = {
        listener.reset()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        (sec, TaskMetricsListener.toUnits(listener.snapshot()))
      }
      run() // warmup
      val runs = Seq.fill(passes)(run())
      val times = runs.map(_._1).sorted
      val median = if (times.size % 2 == 1) times(times.size / 2)
        else (times(times.size / 2 - 1) + times(times.size / 2)) / 2
      medians(name) = median
      raws(name) = runs.map(_._1)
      tele(name) = runs.map(_._2)
      val worst = runs.map(_._2).transpose.map(_.max)
      println(f"[pin] $name median=$median%.3f runs=${runs.map(r => f"${r._1}%.3f").mkString(",")} " +
        f"spill_mb=${num(worst(0))}/${num(worst(1))} gc_s=${num(worst(2))} " +
        f"peak_mb=${num(worst(3))} shuf_mb=${num(worst(4))}/${num(worst(5))} " +
        f"loadavg_end=${loadAvg()}%.2f")
    }
    val qJson = medians.map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    val rawJson = raws.map { case (k, rs) =>
      "\"" + k + "\":" + rs.map(num).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val teleJson = tele.map { case (k, perRun) =>
      val worst = perRun.transpose.map(_.max)
      "\"" + k + "\":" + TaskMetricsListener.keys.zip(worst)
        .map { case (tk, tv) => "\"" + tk + "\":" + num(tv) }
        .mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    println(s"""{"detail":"bench_pin","sf":"$sfDir","stat":"median_of_$passes",""" +
      s""""cpus":$cpus,"driver_mem":"${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",""" +
      s""""queries":$qJson,"raw_runs":$rawJson,"telemetry_worst_run":$teleJson,""" +
      s""""loadavg_end":${num(loadAvg())},"idle_wait_sec":$waited}""")
    spark.stop()
  }
}
