package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid-retrieval composition: fuse independently-produced ranked lists
  * (lexical BM25, embedding ANN, …) into one ranking — the standard
  * retrieval shape for training-data curation (hard-negative mining,
  * dedup-aware sampling) and RAG serving.
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    * `fused(d) = Σ_i 1 / (c + rank_i(d))`, items absent from a list
    * contribute 0 for it. Rank-based fusion needs no score calibration
    * between lists — exactly why it wins for BM25 ⊕ cosine.
    *
    * Inputs are TOP-K lists (each `(idCol, rankCol)`, rank 1-based) —
    * bounded by construction, so the full-outer joins here are trivial
    * (≤ Σ k_i rows); all the heavy lifting stays in the list producers,
    * which use the scale paths (bucketed BM25 postings, IVF/LSH ANN).
    * Ordering runs on the raw double (same both engines: 1.0/(c+rank)
    * summed in list order), ties broken by id; the score is emitted
    * UNROUNDED — identical doubles need no display rounding, and
    * rounding is where Spark and SQL oracles disagree.
    */
  def rrf(lists: Seq[DataFrame], idCol: String, rankCol: String,
      k: Int, c: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrf needs at least one ranked list")
    val keyed = lists.zipWithIndex.map { case (df, i) =>
      df.select(col(idCol).as("id"), col(rankCol).as(s"__r$i"))
    }
    val joined = keyed.reduce((a, b) => a.join(b, Seq("id"), "full_outer"))
    val score = lists.indices.map { i =>
      when(col(s"__r$i").isNotNull,
        lit(1.0) / (lit(c.toDouble) + col(s"__r$i").cast("double")))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    val nLists = lists.indices.map(i =>
      when(col(s"__r$i").isNotNull, 1).otherwise(0)).reduce(_ + _)
    joined
      .select(col("id"), nLists.cast("long").as("n_lists"), score.as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("id"))
      .limit(k)
  }
}
