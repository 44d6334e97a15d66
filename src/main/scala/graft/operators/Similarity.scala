package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`array<float>`).
  *
  * Scale design:
  *  - `bruteForceTopK` broadcasts the (small) probe set and scans the corpus
  *    once — O(corpus × probes) dot products, no shuffle of the corpus, then
  *    a per-probe top-k window over only the scored rows. This is the exact
  *    baseline ANN implementations are judged against.
  *  - `lshTopK` buckets corpus + probes by random-hyperplane signature and
  *    joins bucket-locally with multi-probe (hamming-1 neighbor buckets), so
  *    the candidate set per probe is ~corpus/2^bits × probes instead of the
  *    full cross product. Hyperplanes are seeded → fully deterministic.
  *  - An IVF variant (k-means coarse quantizer) is the next scale step; LSH
  *    was chosen first because it needs no training pass.
  */
object Similarity {

  /** Exact cosine top-k per probe. `probes` must be small (it is collected
    * into a broadcast join); corpus is scanned once, never shuffled.
    */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("corpus_id"), col("embedding").as("c_vec"))
    val p = probes.select(col("vec_id").as("probe_id"), col("embedding").as("p_vec"))
    val scored = c.join(broadcast(p), col("corpus_id") =!= col("probe_id"))
      .withColumn("cosine", cosineSimilarity(col("c_vec"), col("p_vec")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("corpus_id"), col("cosine"), col("rank"))
  }

  /** All pairs (a < b) with cosine ≥ threshold — the set-shaped exact
    * output used by the DuckDB oracle (no top-k order sensitivity).
    * O(n²) — keep for oracle/test scale; LSH is the scale path.
    */
  def thresholdPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = corpus.select(col("vec_id").as("id_a"), col("embedding").as("vec_a"))
    val b = corpus.select(col("vec_id").as("id_b"), col("embedding").as("vec_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", cosineSimilarity(col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= lit(threshold))
      .select("id_a", "id_b", "cosine")
  }

  /** Deterministic seeded gaussian hyperplanes. */
  def randomHyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Approximate cosine top-k via random-hyperplane LSH with multi-probe.
    *
    * Corpus rows land in one bucket each; each probe additionally probes all
    * hamming-1 neighbor buckets (flipping one signature bit), which recovers
    * most near-neighbors lost at bucket boundaries. Join is bucket-equi →
    * shuffle-partitioned by bucket id, no cross product.
    */
  def lshTopK(corpus: DataFrame, probes: DataFrame, k: Int,
      numPlanes: Int = 8, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val planes = randomHyperplanes(numPlanes, dim, seed)
    val c = corpus.select(col("vec_id").as("corpus_id"), col("embedding").as("c_vec"))
      .withColumn("bucket", hyperplaneSignature(col("c_vec"), planes))
    val pSig = probes.select(col("vec_id").as("probe_id"), col("embedding").as("p_vec"))
      .withColumn("sig", hyperplaneSignature(col("p_vec"), planes))
    // multi-probe: own bucket + all hamming-1 buckets
    val probeBuckets = pSig.withColumn("bucket",
      explode(array(
        (col("sig") +: (0 until numPlanes).map(i =>
          col("sig").bitwiseXOR(lit(1L << i)))): _*)))
    val scored = c.join(probeBuckets, Seq("bucket"))
      .filter(col("corpus_id") =!= col("probe_id"))
      .withColumn("cosine", cosineSimilarity(col("c_vec"), col("p_vec")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    scored.select(col("probe_id"), col("corpus_id"), col("cosine"))
      .dropDuplicates("probe_id", "corpus_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
