package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Dev profiling for the minhash pipeline stages. */
object BenchScratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val d = "/root/testdata/sf0.1"
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, d)
    val featured = docs.select(col("doc_id").as("id"),
      wordShingles(col("text"), 3).as("feats")).filter(size(col("feats")) > 0)
    time("shingles only")(featured.write.format("noop").mode("overwrite").save())
    val sigs = featured.withColumn("sig", minHashSignature(col("feats"), 16))
      .select("id", "sig")
    time("shingles+minhash16")(sigs.write.format("noop").mode("overwrite").save())
    val banded = sigs.select(col("id"), explode(lshBandKeys(col("sig"), 4, 4)).as("bk"))
    time("banded")(banded.write.format("noop").mode("overwrite").save())
    val cand = banded.as("a").join(banded.as("b"),
      col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    val nCand = time("candidates")(cand.count())
    println(s"[prof] candidate pairs: $nCand")
    spark.stop()
  }
}
