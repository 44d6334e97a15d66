package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{GraftSession, Tables}

/** Dev profiling for the persisted-LSH serving path (q34_lsh_served /
  * q260_decontam_served): builds the index once, then times the query
  * phases and join-strategy variants. Not part of the driver contract.
  */
object ServedProf {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val emb = Tables.embeddings(spark, d)
    val probes = emb.filter(col("vec_id") < 5)
    val path = s"${sys.props("java.io.tmpdir")}/graft_servedprof_lsh"
    time("index build")(Similarity.writeLshIndex(emb, path))

    val m = Similarity.loadLshMeta(spark, path)
    def candidates() = {
      val probeKeyRows = Similarity.bandKeys(probes, "probe_id", m.numBands,
        m.planesPerBand, m.dim, m.seed)
        .select(col("probe_id"),
          Similarity.fusedBandKey(col("bk.band"), col("bk.key")).as("bk"))
        .withColumn("pb", Similarity.dirBucket(col("bk")))
      spark.read.parquet(s"$path/bands")
        .join(broadcast(probeKeyRows), Seq("pb", "bk"))
        .filter(col("id") =!= col("probe_id"))
        .select(col("probe_id"), col("id").as("corpus_id")).distinct()
    }
    // warmup
    noop(Similarity.bandedLshTopKFromIndex(spark, path, probes, k = 10))

    (1 to 2).foreach { pass =>
      time(s"pass$pass candidates only")(noop(candidates()))
      time(s"pass$pass full (shuffle_hash, current)")(
        noop(Similarity.bandedLshTopKFromIndex(spark, path, probes, k = 10)))
      val c = spark.read.parquet(s"$path/vecs")
        .select(col("id").as("corpus_id"), col("v").as("c_vec"),
          col("nrm").as("c_nrm"))
      val p = Similarity.withNorm(probes, "probe_id", "p_vec", "p_nrm")
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("cosine").desc, col("corpus_id"))
      def rerank(j: org.apache.spark.sql.DataFrame) = j
        .withColumn("cosine", Similarity.pairCosine(
          col("c_vec"), col("p_vec"), col("c_nrm"), col("p_nrm")))
        .select(col("probe_id"), col("corpus_id"), col("cosine"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
      time(s"pass$pass variant: no hint (AQE decides)")(
        noop(rerank(candidates().join(c, "corpus_id").join(p, "probe_id"))))
      time(s"pass$pass variant: broadcast candidates")(
        noop(rerank(c.join(broadcast(candidates()), "corpus_id").join(p, "probe_id"))))
    }
    val cnt = candidates().count()
    println(s"[prof] candidate rows: $cnt")

    // fine breakdown of the candidate phase
    (1 to 2).foreach { pass =>
      time(s"bd$pass loadLshMeta")(Similarity.loadLshMeta(spark, path))
      val probeKeyRows = Similarity.bandKeys(probes, "probe_id", m.numBands,
        m.planesPerBand, m.dim, m.seed)
        .select(col("probe_id"),
          Similarity.fusedBandKey(col("bk.band"), col("bk.key")).as("bk"))
        .withColumn("pb", Similarity.dirBucket(col("bk")))
      time(s"bd$pass probe band keys (noop)")(noop(probeKeyRows))
      time(s"bd$pass isEmpty guard")(probeKeyRows.isEmpty)
      val joined = spark.read.parquet(s"$path/bands")
        .join(broadcast(probeKeyRows), Seq("pb", "bk"))
        .filter(col("id") =!= col("probe_id"))
        .select(col("probe_id"), col("id").as("corpus_id"))
      time(s"bd$pass bands join, no distinct")(noop(joined))
      time(s"bd$pass bands join + distinct")(noop(joined.distinct()))
    }
    spark.stop()
  }
}
