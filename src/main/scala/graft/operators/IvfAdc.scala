package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{squaredL2Distance, toDouble}

/** IVFADC — the canonical billion-scale ANN architecture (Jégou et al.
  * 2011 §IV): a coarse IVF quantizer prunes the search to `nprobe`
  * cells, and product-quantized RESIDUALS (v − coarse centroid) give a
  * compressed in-cell distance — the composition of [[IvfIndex]]
  * (partition pruning) and [[PqIndex]] (32× compression + ADC lookups).
  *
  * Why residuals: within a cell, vectors share the centroid's offset;
  * quantizing v − c(v) spends the PQ codebook's resolution on the
  * in-cell spread instead of the global layout — the standard accuracy
  * win over flat PQ at the same code budget.
  *
  * Scale story: the fleet-sized corpus is stored as (cell, m codes) —
  * prunable by cell partition AND 32× smaller than raw floats; a query
  * touches nprobe cells × (per-cell ADC lookup tables built from ONE
  * probe row) and never reads a raw corpus vector.
  *
  * Determinism: both trainings follow the IvfIndex/PqIndex contract
  * (xxhash64 seeds, argmin ties toward smaller cell/code, AVG means
  * with the accepted summation-order ulp); probe cell choice ranks by
  * (squared distance, cell); the final ADC fold is subspace-ordered.
  */
object IvfAdc {

  final case class Model(coarse: IvfIndex.Model, pq: PqIndex.Model)

  private def centArr(m: IvfIndex.Model): Column =
    array(m.centroids.sortBy(_._1).map { case (_, v) => typedlit(v) }: _*)

  /** Train coarse quantizer on the corpus, then PQ on coarse residuals. */
  def train(corpus: DataFrame, kCells: Int, m: Int, pqK: Int,
      iterations: Int, dim: Int): Model = {
    val coarse = IvfIndex.train(corpus, kCells, iterations)
    val pq = PqIndex.train(
      residuals(corpus, coarse).select(col("vec_id"), col("rv").as("embedding")),
      dim, m, pqK, iterations)
    Model(coarse, pq)
  }

  /** (vec_id, cell, rv): coarse assignment + residual vector. */
  def residuals(corpus: DataFrame, coarse: IvfIndex.Model): DataFrame = {
    val ca = centArr(coarse)
    IvfIndex.assign(corpus, coarse)
      .select(col("vec_id"), col("cell"),
        zip_with(col("v"), element_at(ca, col("cell") + 1),
          (x, c) => x - c).as("rv"))
  }

  /** Compressed index rows: (vec_id, cell, codes[m]) — one narrow pass
    * over the residual frame, PQ codes from the plan-literal codebooks.
    */
  def encode(corpus: DataFrame, model: Model): DataFrame =
    residuals(corpus, model.coarse)
      .select(col("vec_id"), col("cell"),
        PqIndex.encodeVec(col("rv"), model.pq).as("codes"))

  /** ADC top-k through the inverted lists: per probe, the `nprobe`
    * nearest coarse cells (ranked by (distance, cell) over the literal
    * centroids — a per-row computation, no job); per (probe, cell) an
    * ADC lookup table on the probe's CELL residual; candidates join the
    * tiny table on their cell (broadcast — codes never shuffle) and fold
    * m lookups. Self-matches excluded.
    */
  def topK(codes: DataFrame, probes: DataFrame, model: Model,
      nprobe: Int, k: Int): DataFrame = {
    val ca = centArr(model.coarse)
    val pcells = probes
      .select(col("vec_id").as("probe_id"), toDouble(col("embedding")).as("pv"))
      .select(col("probe_id"), col("pv"),
        explode(slice(array_sort(transform(ca,
          (c, i) => struct(squaredL2Distance(col("pv"), c).as("d"),
            i.as("cell")))), 1, nprobe)).as("pc"))
      .select(col("probe_id"), col("pv"), col("pc.cell").as("cell"))
    val dtab = pcells
      .select(col("probe_id"), col("cell"),
        PqIndex.distanceTable(
          zip_with(col("pv"), element_at(ca, col("cell") + 1),
            (x, c) => x - c), model.pq).as("dt"))
    codes.join(broadcast(dtab), Seq("cell"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("adc", PqIndex.adcDistance(col("dt"), col("codes"), model.pq.m))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("probe_id"))
          .orderBy(col("adc"), col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("vec_id").as("corpus_id"),
        round(col("adc"), 4).as("adc_dist"), col("rank"))
  }
}
