package graft

import org.apache.spark.sql.functions.col

/** Dev tool: single-shot scale probe for a handful of lanes at a big
  * GenScale SF (the r10-verdict #5 sf100 session) — one idle-gated
  * timed run per lane with per-run task telemetry, warmed at a SMALL
  * SF so JIT/codegen is paid without running the big SF twice (at
  * sf100 a warmup pass would double a multi-hour session; the JIT cost
  * it hides is seconds).
  *
  * Served lanes (index built once OUTSIDE the timed window — the Bench
  * servedEntry shape) are special-cased by name; everything else is a
  * SparkEntry.queries lane.
  *
  * Usage: runMain graft.ScaleProbe <sfDir> <warmSfDir> <lane> [...]
  */
object ScaleProbe {

  private def envInt(name: String, default: Int): Int =
    sys.env.get(name).flatMap(_.toIntOption).getOrElse(default)

  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ScaleProbe <sfDir> <warmSfDir> <lane>...")
    val sfDir = args(0); val warmDir = args(1); val lanes = args.drop(2)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS")
      .flatMap(_.toIntOption).getOrElse(32)
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)
    // Shuffle-partition override for big probe SFs: tune()'s cores×3 is
    // the LOCAL sizing; at sf100 the per-partition aggregation state of
    // gram-heavy lanes no longer fits an executor share and spills —
    // the same lever a real cluster turns (partitions ∝ data volume,
    // the SCALE.md knob table), surfaced here as an env var so probe
    // runs can pin the with/without comparison.
    sys.env.get("SPARK_GRAFT_SHUFFLE").flatMap(_.toIntOption).foreach { n =>
      spark.conf.set("spark.sql.shuffle.partitions", n)
    }
    val listener = new TaskMetricsListener
    spark.sparkContext.addSparkListener(listener)
    def loadAvg(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    val maxWait = sys.env.get("SPARK_GRAFT_IDLE_WAIT")
      .flatMap(_.toIntOption).getOrElse(300)
    var waited = 0
    while (loadAvg() > 2.0 && waited < maxWait) { Thread.sleep(5000); waited += 5 }
    val loadStart = loadAvg()
    System.err.println(f"[probe] loadavg=$loadStart%.2f idle_wait=${waited}s sf=$sfDir")

    // SPARK_GRAFT_LSH_NPROBES: probe-batch width for the LSH serving
    // lanes (default = the 5-vector Bench shape). Wide batches are
    // where the q402 sign-screen's float-read deferral shows: the
    // candidate volume becomes |probes|-bounded, not constant.
    val lshProbes = sys.env.get("SPARK_GRAFT_LSH_NPROBES")
      .flatMap(_.toLongOption).getOrElse(5L)
    val tmp = sys.props("java.io.tmpdir")
    val runTag = spark.sparkContext.applicationId.replace("-", "_")

    /** (build at probe SF — untimed, warm query at warm SF, timed query
      * at probe SF). Plain lanes have identity build and the queries()
      * lane for both warm and timed.
      */
    def lane(name: String): (() => Unit, String => org.apache.spark.sql.DataFrame) =
      name match {
        case "q260_decontam_served" =>
          val path = s"$tmp/graft_probe_decon_$runTag"
          // SPARK_GRAFT_EVAL_MOD: eval-slice modulus. Default 97 scales
          // the eval set WITH the corpus (GenScale offsets ids), which
          // is not the steady-state decontam shape — real eval suites
          // are fixed-size while the corpus grows, and candidate volume
          // is |eval| × avg bucket size. Big-SF probes pass a larger
          // modulus to hold |eval| at the sf10 size.
          val evalMod = sys.env.get("SPARK_GRAFT_EVAL_MOD")
            .flatMap(_.toLongOption).getOrElse(97L)
          // SPARK_GRAFT_DECON_PLANES: planesPerBand for the decontam
          // index build (default = the oracle-pinned 4). Candidate
          // volume is |eval| × numBands × (corpus / 2^planes): at a
          // fixed recall target the planes knob is what a growing
          // corpus turns (same lever as q34's) — 4-bit keys admit
          // corpus/16 candidates per band BY CONSTRUCTION, so the
          // residual shuffle/spill of the default-planes probe is the
          // candidate volume itself, not the plan.
          val deconPlanes = envInt("SPARK_GRAFT_DECON_PLANES", 4)
          // SPARK_GRAFT_DECON_FLIPS: multi-probe level on the eval side
          // (0 = exact key, 1 = key ± every 1-bit flip). The companion
          // knob: a wide-planes index is only honest decontam if the
          // flip set restores the recall the selectivity costs.
          val deconFlips = envInt("SPARK_GRAFT_DECON_FLIPS", 0)
          (() => graft.operators.Similarity.writeLshIndex(
            Tables.embeddings(spark, sfDir).filter(col("vec_id") % evalMod =!= 0),
            path, planesPerBand = deconPlanes),
            d => {
              // warm pass probes the big index too (index is the build
              // product; the warm run still pays the small-plan JIT)
              graft.operators.TrainingData.decontaminateSemanticServed(
                Tables.embeddings(spark, d).filter(col("vec_id") % evalMod === 0),
                path, threshold = 0.3, probeFlips = deconFlips)
            })
        // Served ANN lanes (r11 verdict #6): index built at the probe SF
        // untimed, probe frame = the Bench probe shape (5 vectors). The
        // claim under test is near-flat query cost vs corpus size — the
        // input_read_mb telemetry is the partition-pruning evidence.
        case "q34_lsh_served" =>
          val path = s"$tmp/graft_probe_lsh_$runTag"
          // SPARK_GRAFT_LSH_PLANES: planesPerBand for the probe index
          // build (default = the oracle-pinned 4). Big-SF probes raise
          // it — per-band signatures (r12) let selectivity scale with
          // corpus size, the documented q34 scale lever.
          val planes = envInt("SPARK_GRAFT_LSH_PLANES", 4)
          // SPARK_GRAFT_LSH_FLIPS: multi-probe level (0/1) — the recall
          // companion of the planes knob, same contract as the decontam
          // lane's SPARK_GRAFT_DECON_FLIPS
          val lshFlips = envInt("SPARK_GRAFT_LSH_FLIPS", 0)
          (() => graft.operators.Similarity.writeLshIndex(
            Tables.embeddings(spark, sfDir), path, planesPerBand = planes),
            d => graft.operators.Similarity.bandedLshTopKFromIndex(
              spark, path,
              Tables.embeddings(spark, d).filter(col("vec_id") < lshProbes),
              k = 10, probeFlips = lshFlips))
        case "q402_lsh_screened_served" =>
          val path = s"$tmp/graft_probe_lshscr_$runTag"
          val planes = envInt("SPARK_GRAFT_LSH_PLANES", 4)
          val lshFlips = envInt("SPARK_GRAFT_LSH_FLIPS", 0)
          (() => graft.operators.Similarity.writeLshIndex(
            Tables.embeddings(spark, sfDir), path, planesPerBand = planes),
            d => graft.operators.Similarity.bandedLshTopKFromIndexScreened(
              spark, path,
              Tables.embeddings(spark, d).filter(col("vec_id") < lshProbes),
              k = 10, rerank = 4, probeFlips = lshFlips))

        case "q52_ivf_served" =>
          val path = s"$tmp/graft_probe_ivf_$runTag"
          (() => {
            val m = graft.operators.IvfIndex.train(
              Tables.embeddings(spark, sfDir), k = 8, iterations = 3)
            graft.operators.IvfIndex.writeIndex(
              Tables.embeddings(spark, sfDir), m, path)
          },
            d => graft.operators.IvfIndex.topKFromIndex(spark, path,
              Tables.embeddings(spark, d).filter(col("vec_id") < 5),
              k = 10, nprobe = 4))
        case "q153_ivfadc_served" =>
          val path = s"$tmp/graft_probe_ivfadc_$runTag"
          (() => {
            val m = graft.operators.IvfAdc.train(
              Tables.embeddings(spark, sfDir), kCells = 8, m = 8, pqK = 16,
              iterations = 3, dim = 64)
            graft.operators.IvfAdc.writeIndex(
              Tables.embeddings(spark, sfDir), m, path)
          },
            d => graft.operators.IvfAdc.topKFromIndex(spark, path,
              Tables.embeddings(spark, d).filter(col("vec_id") < 5),
              nprobe = 4, k = 10))
        case "q351_bucketed_served" =>
          val lt = s"probe_b_lineitem_$runTag"; val ot = s"probe_b_orders_$runTag"
          (() => {
            spark.sql(s"DROP TABLE IF EXISTS $lt")
            spark.sql(s"DROP TABLE IF EXISTS $ot")
            Tables.lineitem(spark, sfDir).write.mode("overwrite")
              .bucketBy(16, "l_orderkey").sortBy("l_orderkey").saveAsTable(lt)
            Tables.orders(spark, sfDir).write.mode("overwrite")
              .bucketBy(16, "o_orderkey").sortBy("o_orderkey").saveAsTable(ot)
          },
            _ => {
              import org.apache.spark.sql.functions.{count, lit, sum}
              spark.table(lt).hint("merge")
                .join(spark.table(ot), col("l_orderkey") === col("o_orderkey"))
                .groupBy(col("o_orderstatus"))
                .agg(count(lit(1)).as("n_items"),
                  sum(col("l_quantity").cast("decimal(18,2)"))
                    .cast("decimal(38,2)").cast("string").as("total_qty"))
            })
        case q =>
          (() => (), d => SparkEntry.queries(q)(spark, d))
      }

    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val times = scala.collection.mutable.LinkedHashMap[String, Double]()
    val tele = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val rowCounts = scala.collection.mutable.LinkedHashMap[String, Long]()
    lanes.foreach { name =>
      val (build, query) = lane(name)
      try {
        build()
        if (name != "q351_bucketed_served") // bucketed warm tables ARE the probe tables
          query(warmDir).write.format("noop").mode("overwrite").save()
        listener.reset()
        val t0 = System.nanoTime()
        query(sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        times(name) = sec
        tele(name) = TaskMetricsListener.toUnits(listener.snapshot())
        System.err.println(f"[probe] $name ${sec}%.1fs " +
          TaskMetricsListener.keys.zip(tele(name))
            .map { case (k, v) => s"$k=${num(v)}" }.mkString(" "))
        // SPARK_GRAFT_PROBE_COUNT=1: untimed result-cardinality pass —
        // the RECALL side of a selectivity experiment (e.g. decontam at
        // wide planes: how many contaminated ids still surface). Own
        // try: a count failure must not clobber the timing already
        // recorded for the successful timed run.
        if (sys.env.get("SPARK_GRAFT_PROBE_COUNT").contains("1")) {
          try {
            val n = query(sfDir).count()
            rowCounts(name) = n
            System.err.println(s"[probe] $name result_rows=$n")
          } catch { case e: Throwable =>
            System.err.println(s"[probe] $name count FAILED: ${e.getMessage}")
          }
        }
      } catch { case e: Throwable =>
        times(name) = -1.0
        System.err.println(s"[probe] $name FAILED: ${e.getMessage}")
      }
    }
    val qs = times.map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    val teleJson = tele.map { case (k, u) =>
      "\"" + k + "\":" + TaskMetricsListener.keys.zip(u)
        .map { case (tk, tv) => "\"" + tk + "\":" + num(tv) }
        .mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    val env = s"""{"loadavg_start":${num(loadStart)},"loadavg_end":${num(loadAvg())},"cpus":$cpus,"stat":"single_run_warm_small_sf","idle_gate_wait_sec":$waited}"""
    val rowsJson =
      if (rowCounts.isEmpty) ""
      else rowCounts.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString(""","result_rows":{""", ",", "}")
    val line = s"""{"metric":"scale_probe","unit":"sec","queries":$qs,"telemetry":$teleJson$rowsJson,"env":$env,"sf":"$sfDir"}"""
    println(line)
    System.out.flush()
    spark.stop()
    println(line)
    System.out.flush()
  }
}
