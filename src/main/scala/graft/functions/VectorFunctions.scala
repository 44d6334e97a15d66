package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `ArrayType` columns (the `embeddings.parquet`
  * `array<float>` column), built from codegen'd higher-order functions —
  * no UDFs, so the expressions stay inside whole-stage codegen and
  * distribute trivially.
  *
  * All math is done in double: float32 inputs are cast element-wise first,
  * which also makes results comparable with a DuckDB oracle computing over
  * `embedding::DOUBLE[]`.
  */
object VectorFunctions {

  /** Element-wise cast to array<double>. */
  def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Dot product of two equal-length float/double arrays — backed by the
    * codegen'd [[graft.functions.DotProduct]] kernel (same in-order
    * double-summed arithmetic as the interpreted
    * `aggregate(zip_with(...))` form it replaces, ~3× faster).
    */
  def dotProduct(a: Column, b: Column): Column =
    HashFunctions.dotProduct(a, b)

  /** L2 norm (dot of a vector with itself). */
  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** Cosine similarity in [-1, 1]; null if either vector has zero norm. */
  def cosineSimilarity(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom =!= lit(0.0), dotProduct(a, b) / denom)
  }

  /** Squared euclidean distance — backed by the codegen'd
    * [[graft.functions.SquaredL2Distance]] kernel (same in-order
    * Σ(aᵢ-bᵢ)² double arithmetic as the interpreted
    * `aggregate(zip_with(...))` form it replaces; that HOF chain was
    * the innermost loop of every k-means assignment pass).
    */
  def squaredL2Distance(a: Column, b: Column): Column =
    HashFunctions.squaredL2Distance(a, b)

  /** Sign bits of projections onto `planes` (random hyperplane LSH): packs
    * up to 63 hyperplane sign bits into one long bucket id. Deterministic
    * given the (seeded) planes; see [[graft.operators.Similarity]].
    */
  def hyperplaneSignature(vec: Column, planes: Seq[Array[Double]]): Column = {
    require(planes.size <= 63, "at most 63 hyperplanes per signature")
    planes.zipWithIndex.map { case (p, i) =>
      // typedlit → ONE array literal, not a per-row CreateArray of dims
      val planeCol = typedlit(p)
      when(dotProduct(vec, planeCol) >= lit(0.0), lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }
}
