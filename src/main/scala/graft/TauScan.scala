package graft
import org.apache.spark.sql.functions._

/** Dev main: per-τ recall of the banded embedding near-dup candidate
  * generator vs the exact all-pairs set — picks the τ where banded
  * recall is total (q53's oracle-exactness requirement).
  */
object TauScan {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[16]", 16).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val emb = Tables.table(spark, d, "embeddings")
      for (tau <- Seq(0.4, 0.5, 0.6, 0.7)) {
        val exact = graft.operators.Similarity.thresholdPairs(emb, tau)
          .select("id_a", "id_b")
        val banded = graft.operators.Dedup.embeddingNearDups(emb, tau)
          .select("id_a", "id_b").withColumn("hit", lit(1))
        val agg = exact.join(banded, Seq("id_a", "id_b"), "left")
          .agg(count(lit(1)).as("exact"),
            sum(when(col("hit").isNull, 1).otherwise(0)).as("missed"))
          .collect()(0)
        println(s"[tau] $sf tau=$tau exact=${agg.get(0)} missed=${agg.get(1)}")
      }
    }
    spark.stop()
  }
}
