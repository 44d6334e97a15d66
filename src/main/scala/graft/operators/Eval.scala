package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier-evaluation operators over scored corpora — the offline
  * model-quality reports a curation pipeline runs after scoring (the
  * reference's quality_audit.py is a rule audit; these are the
  * model-side analogue, exercised on the same engine surface as the
  * q136/q181/q188 scoring family).
  */
object Eval {

  /** Precision-recall threshold sweep: one row per DISTINCT score,
    * treating "predict positive" as score ≥ threshold — the full PR
    * curve (and F1 sweep) in a single pass, companion to q188's AUC
    * (which integrates this curve's ranking; this exposes the operating
    * points).
    *
    * `labelCol` must be a 0/1 numeric. Counts aggregate per distinct
    * score first, so the descending cumulative window runs on the
    * AGGREGATED frame (bounded by distinct scores, never corpus rows);
    * tp/fp/fn are exact BIGINTs, precision/recall/F1 are single
    * BIGINT-quotient divides rounded 4dp. F1 folds to 2·tp/(pp+p)
    * (pp = predicted positive, p = total positive) — one divide, no
    * chained FP. Requires at least one positive and one scored row;
    * with p = 0 recall/F1 are NULL (division by zero), by design.
    */
  def prCurve(scored: DataFrame, scoreCol: String,
      labelCol: String): DataFrame = {
    val g = scored
      .groupBy(col(scoreCol).as("threshold"))
      .agg(count(lit(1)).as("__n"), sum(col(labelCol)).as("__pos"))
    val wDesc = Window.orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = g.agg(sum(col("__pos")).as("__p"))
    g.withColumn("tp", sum(col("__pos")).over(wDesc))
      .withColumn("__pp", sum(col("__n")).over(wDesc))
      .crossJoin(broadcast(totals))
      .select(col("threshold"), col("tp"),
        (col("__pp") - col("tp")).as("fp"),
        (col("__p") - col("tp")).as("fn"),
        round(col("tp").cast("double") / col("__pp"), 4).as("prec"),
        round(col("tp").cast("double") / col("__p"), 4).as("recall"),
        round(lit(2.0) * col("tp").cast("double") /
          (col("__pp") + col("__p")), 4).as("f1"))
  }

  /** Bradley-Terry strength fit over pairwise comparisons (model A vs
    * model B, A wins / loses) via Hunter 2004's MM iteration
    * s_i ← W_i / Σ_{j≠i} n_ij / (s_i + s_j) — the standard
    * preference-eval aggregate behind LLM arena leaderboards, fit here
    * as a declarative fixed-iteration plan.
    *
    * Scale shape: the million-row match log reduces to the k×k
    * pair-count matrix in ONE partial-agg pass (k = #models, small by
    * nature); every iteration then runs on that bounded frame, eagerly
    * checkpointed per round — the s-frame is referenced TWICE per
    * iteration (s_i and s_j sides), so without truncation the plan DAG
    * doubles per round (2^iterations analysis blowup, the pageRank
    * lesson).
    *
    * Determinism: exact integer W/n; each denominator folds its
    * opponent terms in j-sorted order (one fixed IEEE sequence, k
    * terms); s⁰ = 1 and every update is the same op tree both engines
    * — raw doubles stay bit-equal, rounded 6dp at the edge. Scale is
    * pinned by s⁰ (no renormalization); callers compare ratios.
    * Degenerate inputs where two zero-win models only play each other
    * yield NULL/NaN scores for those models, by design.
    */
  def bradleyTerry(matches: DataFrame, aCol: String, bCol: String,
      aWinsCol: String, iterations: Int = 8): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val dir = matches
      .select(col(aCol).as("i"), col(bCol).as("j"),
        when(col(aWinsCol).cast("boolean"), 1L).otherwise(0L).as("wi"))
      .filter(col("i") =!= col("j"))
    val sym = dir.unionAll(dir.select(col("j").as("i"), col("i").as("j"),
      (lit(1L) - col("wi")).as("wi")))
    val pair = sym.groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"), sum(col("wi")).as("w"))
      .localCheckpoint(true) // k² rows; read every iteration
    val wins = pair.groupBy(col("i")).agg(sum(col("w")).as("wtot"))
      .localCheckpoint(true)
    var s = wins.select(col("i"), lit(1.0).as("s"))
    (1 to iterations).foreach { _ =>
      val denom = pair
        .join(s.select(col("i"), col("s").as("si")), Seq("i"))
        .join(s.select(col("i").as("j"), col("s").as("sj")), Seq("j"))
        .groupBy(col("i"))
        .agg(aggregate(
          transform(array_sort(collect_list(struct(col("j"),
            (col("n").cast("double") / (col("si") + col("sj"))).as("t")))),
            x => x.getField("t")),
          lit(0.0), (acc, x) => acc + x).as("d"))
      s = wins.join(denom, Seq("i"))
        .select(col("i"), (col("wtot").cast("double") / col("d")).as("s"))
        .localCheckpoint(true)
    }
    s.select(col("i").as("model"), round(col("s"), 6).as("bt_score"))
  }

  /** Cohen's kappa (Cohen 1960) between two binary raters over the same
    * rows — the chance-corrected agreement number a curation pipeline
    * runs before trusting a cheap heuristic as a proxy for an expensive
    * rule (or one annotator for another). One partial-agg pass builds
    * the exact 2×2 contingency counts; p_o, p_e and kappa are three
    * fixed-order double expressions on those BIGINTs (n² as a double
    * PRODUCT — the q307 overflow stance). Rows where either rater is
    * NULL are excluded (agreement is defined on co-rated rows only).
    * kappa is NULL when p_e = 1 (degenerate single-cell table).
    */
  def cohensKappa(df: DataFrame, aCol: org.apache.spark.sql.Column,
      bCol: org.apache.spark.sql.Column): DataFrame = {
    val counts = df
      .select(aCol.cast("boolean").as("__a"), bCol.cast("boolean").as("__b"))
      .filter(col("__a").isNotNull && col("__b").isNotNull)
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("__a") && col("__b"), 1L).otherwise(0L)).as("n_both"),
        sum(when(col("__a") && !col("__b"), 1L).otherwise(0L)).as("n_only_a"),
        sum(when(!col("__a") && col("__b"), 1L).otherwise(0L)).as("n_only_b"),
        sum(when(!col("__a") && !col("__b"), 1L).otherwise(0L)).as("n_neither"))
    val nD = col("n").cast("double")
    val po = (col("n_both") + col("n_neither")).cast("double") / nD
    val pe = ((col("n_both") + col("n_only_a")).cast("double") *
      (col("n_both") + col("n_only_b")).cast("double") +
      (col("n_only_b") + col("n_neither")).cast("double") *
        (col("n_only_a") + col("n_neither")).cast("double")) / (nD * nD)
    counts.select(col("n"), col("n_both"), col("n_only_a"),
      col("n_only_b"), col("n_neither"),
      round(po, 4).as("po"), round(pe, 4).as("pe"),
      when(pe < 1.0, round((po - pe) / (lit(1.0) - pe), 4)).as("kappa"))
  }
}
