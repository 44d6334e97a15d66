package graft

/** Dev-loop lane timer: the [[Bench]] protocol (sf0.001 warmup, then
  * median-of-N noop-sink runs) for NAMED headline lanes only, so one
  * optimized operator can be re-measured in seconds instead of re-running
  * the whole matrix. Usage:
  *   runMain graft.BenchOne <sfDir> <passes> <query> [<query> ...]
  * Reads SPARK_GRAFT_CPUS like Bench (default 32). Not part of the driver
  * contract — Bench.scala remains the graded benchmark.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: BenchOne <sfDir> <passes> <query>...")
    val sfDir = args(0); val passes = args(1).toInt; val names = args.drop(2)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS")
      .flatMap(_.toIntOption).filter(_ > 0).getOrElse(32)
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)
    def runOnce(name: String, d: String): Unit =
      SparkEntry.queries(name)(spark, d)
        .write.format("noop").mode("overwrite").save()
    names.foreach { name =>
      try runOnce(name, "/root/testdata/sf0.001")
      catch { case e: Throwable =>
        System.err.println(s"[benchone] warmup $name skipped: ${e.getMessage}")
      }
    }
    names.foreach { name =>
      val runs = (1 to passes).flatMap { _ =>
        try {
          val t0 = System.nanoTime()
          runOnce(name, sfDir)
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[benchone] $name failed: ${e.getMessage}"); None
        }
      }
      val med =
        if (runs.isEmpty) -1.0
        else {
          val s = runs.sorted
          if (s.size % 2 == 1) s(s.size / 2)
          else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
        }
      println(f"[benchone] $name median=$med%.3f runs=${runs.map(r => f"$r%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
