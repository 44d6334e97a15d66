package graft

import org.apache.spark.sql.functions._

/** Dev profiling scratch for the r12 optimization round — phase timings
  * inside the expensive lanes. Not part of the driver contract.
  */
object OptProf {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val d = "/root/testdata/sf0.1"
    // per-job wall-clock tracer
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          { jobStart.put(js.jobId, System.nanoTime()); () }
        override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0 = jobStart.get(je.jobId)
          if (t0 != 0L) println(f"[job] ${je.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        }
      })
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---- q329 phases -----------------------------------------------
    val op = Tables.lineitem(spark, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val edges = op.join(op.withColumnRenamed("p", "p2"), Seq("o"))
      .filter(col("p") < col("p2"))
      .select(col("p").as("src"), col("p2").as("dst"))
    // warmup pass
    noop(edges)
    time("q329 edges only")(noop(edges))
    time("q329 full LPA")(noop(
      graft.operators.Graph.labelPropagation(edges, "src", "dst", iterations = 4)))
    time("q329 full LPA again")(noop(
      graft.operators.Graph.labelPropagation(edges, "src", "dst", iterations = 4)))

    // ---- LPA internals (replicated with phase timing) ----------------
    {
      import org.apache.spark.sql.graftbridge.ColumnBridge
      val owner = edges.sparkSession
      val e = edges.select(
          least(col("src"), col("dst")).as("s"),
          greatest(col("src"), col("dst")).as("t"))
        .filter(col("s") < col("t")).distinct()
      val cloned = owner.newSession()
      owner.conf.getAll.foreach { case (k, v) =>
        try cloned.conf.set(k, v) catch { case _: Exception => () }
      }
      val eC = time("lpa eC checkpoint")(
        ColumnBridge.ofRows(cloned, ColumnBridge.analyzed(e)).localCheckpoint(true))
      val n = time("lpa count")(eC.count())
      println(s"[prof] lpa edges=$n")
      val nPart = math.max(32, math.min(2048, (2L * n / 2000000L + 1).toInt))
      cloned.conf.set("spark.sql.shuffle.partitions", nPart.toString)
      val sym = time("lpa sym checkpoint")(
        eC.select(col("s").as("u"), col("t").as("v"))
          .unionAll(eC.select(col("t").as("u"), col("s").as("v")))
          .repartition(nPart, col("u"))
          .sortWithinPartitions(col("u"))
          .localCheckpoint(true))
      ColumnBridge.releaseCheckpoint(eC)
      var labels = time("lpa round1")(
        sym.groupBy(col("v").as("node"))
          .agg(min(col("u")).as("label"))
          .localCheckpoint(true))
      (2 to 4).foreach { i =>
        val cnt = sym
          .join(labels.select(col("node").as("u"), col("label")), Seq("u"))
          .select(col("v"), col("label"))
          .repartition(nPart, col("v"))
          .groupBy(col("v").as("node"), col("label"))
          .agg(count(lit(1)).as("__c"))
        val next = time(s"lpa round$i")(cnt.groupBy(col("node"))
          .agg(min(struct((-col("__c")).as("__nc"), col("label").as("__l")))
            .as("__best"))
          .select(col("node"), col("__best.__l").as("label"))
          .localCheckpoint(true))
        ColumnBridge.releaseCheckpoint(labels)
        labels = next
      }
      ColumnBridge.releaseCheckpoint(sym)
    }

    // ---- etl_pipeline phases ------------------------------------------
    {
      import graft.etl._
      val tmp = sys.props("java.io.tmpdir")
      val fx = EtlScaleFixtures.synthesize(s"$tmp/graft_etl_prof",
        20, 3370, 20, 1090)
      // warmup
      WeatherPipeline.runMany(spark, fx.manifests, Some(fx.jsonPath),
        new ParquetSink(s"$tmp/graft_etl_prof_sink")): Unit
      // sub-phase: raw CSV scan vs + transform vs + JSON union
      val rawCsv = spark.read
        .option("sep", ";").option("encoding", "ISO-8859-1")
        .option("header", "true").option("mode", "PERMISSIVE")
        .schema(WuCsvSource.wuLayout)
        .csv(fx.manifests.values.flatten.map(_.path).toSeq.distinct: _*)
      time("etl raw csv scan")(noop(rawCsv))
      val fleet = WuCsvSource.readFleet(spark, fx.manifests, WeatherSchema.SourceWu)
      time("etl fleet read+transform")(noop(fleet))
      val jsonSrc = InfoclimatJsonSource.read(spark, fx.jsonPath)
      time("etl json source")(noop(jsonSrc))
      val df = WeatherPipeline.unifiedMany(spark, fx.manifests, Some(fx.jsonPath))
      df.cache()
      time("etl cache materialize")(noop(df))
      time("etl integrity agg")(IntegrityReport.compute(df))
      val sink = new ParquetSink(s"$tmp/graft_etl_prof_sink")
      time("etl sink overwrite")(sink.overwrite(df))
      time("etl post audit")(QualityAudit.compute(sink.read(spark)))
      df.unpersist()
      val t0 = System.nanoTime()
      WeatherPipeline.runMany(spark, fx.manifests, Some(fx.jsonPath),
        new ParquetSink(s"$tmp/graft_etl_prof_sink")): Unit
      println(f"[prof] etl full runMany: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // ---- q153 phases -----------------------------------------------
    val emb = Tables.embeddings(spark, d)
    noop(emb)
    time("q153 coarse train (3 it)") {
      graft.operators.IvfIndex.train(emb, k = 8, iterations = 3)
    }
    val model = time("q153 full train (coarse+pq)") {
      graft.operators.IvfAdc.train(emb, kCells = 8, m = 8, pqK = 16,
        iterations = 3, dim = 64)
    }
    val codes = graft.operators.IvfAdc.encode(emb, model)
    time("q153 encode")(noop(codes))
    time("q153 topk") {
      noop(graft.operators.IvfAdc.topK(codes,
        emb.filter(col("vec_id") < 5), model, nprobe = 4, k = 10))
    }
    spark.stop()
  }
}
