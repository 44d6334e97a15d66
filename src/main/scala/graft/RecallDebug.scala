package graft
import org.apache.spark.sql.functions._
object RecallDebug {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val emb = Tables.table(spark, d, "embeddings")
      val probes = emb.filter(col("vec_id") < 5)
      val ex = graft.operators.Similarity.bruteForceTopK(emb, probes, 10)
        .select(col("probe_id"), col("corpus_id"))
      val ap = graft.operators.Similarity.lshTopK(emb, probes, 10)
        .select(col("probe_id"), col("corpus_id")).withColumn("hit", lit(1))
      val hits = ex.join(ap, Seq("probe_id", "corpus_id"), "left")
        .groupBy("probe_id").agg(sum(coalesce(col("hit"), lit(0))).as("hits"))
        .orderBy("probe_id").collect()
      println(s"[recall] $sf lsh: " + hits.map(r => s"${r.get(0)}:${r.get(1)}").mkString(" "))
      val model = graft.operators.IvfIndex.train(emb, k = 8, iterations = 3)
      val ap2 = graft.operators.IvfIndex.topK(emb, probes, model, k = 10, nprobe = 4)
        .select(col("probe_id"), col("corpus_id")).withColumn("hit", lit(1))
      val hits2 = ex.join(ap2, Seq("probe_id", "corpus_id"), "left")
        .groupBy("probe_id").agg(sum(coalesce(col("hit"), lit(0))).as("hits"))
        .orderBy("probe_id").collect()
      println(s"[recall] $sf ivf: " + hits2.map(r => s"${r.get(0)}:${r.get(1)}").mkString(" "))
      val ap3 = graft.operators.Similarity.bandedLshTopK(emb, probes, 10)
        .select(col("probe_id"), col("corpus_id")).withColumn("hit", lit(1))
      val hits3 = ex.join(ap3, Seq("probe_id", "corpus_id"), "left")
        .groupBy("probe_id").agg(sum(coalesce(col("hit"), lit(0))).as("hits"))
        .orderBy("probe_id").collect()
      println(s"[recall] $sf banded: " + hits3.map(r => s"${r.get(0)}:${r.get(1)}").mkString(" "))
      val pairs = graft.operators.Dedup.embeddingNearDups(emb, threshold = 0.3)
        .count()
      println(s"[recall] $sf banded-pairs(tau=0.3): $pairs")
      // IVFADC: ADC-only vs ADC->exact-rerank, both against exact L2 top-k
      val exL2 = graft.operators.Similarity.bruteForceTopKL2(emb, probes, 10)
        .select(col("probe_id"), col("corpus_id"))
      val am = graft.operators.IvfAdc.train(emb, kCells = 8, m = 8,
        pqK = 16, iterations = 3, dim = 64)
      val codes = graft.operators.IvfAdc.encode(emb, am)
      def hitsOf(ap: org.apache.spark.sql.DataFrame, tag: String): Unit = {
        val h = exL2.join(ap.select(col("probe_id"), col("corpus_id"))
            .withColumn("hit", lit(1)), Seq("probe_id", "corpus_id"), "left")
          .groupBy("probe_id").agg(sum(coalesce(col("hit"), lit(0))).as("hits"))
          .orderBy("probe_id").collect()
        println(s"[recall] $sf $tag: " + h.map(r => s"${r.get(0)}:${r.get(1)}").mkString(" "))
      }
      hitsOf(graft.operators.IvfAdc.topK(codes, probes, am, nprobe = 4, k = 10), "adc-only")
      hitsOf(graft.operators.IvfAdc.topKReranked(codes, emb, probes, am,
        nprobe = 4, rerank = 30, k = 10), "adc-rerank30")
      hitsOf(graft.operators.IvfAdc.topKReranked(codes, emb, probes, am,
        nprobe = 4, rerank = 100, k = 10), "adc-rerank100-np4")
      hitsOf(graft.operators.IvfAdc.topKReranked(codes, emb, probes, am,
        nprobe = 6, rerank = 100, k = 10), "adc-rerank100-np6")
    }
    spark.stop()
  }
}
