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

  /** Fleiss' kappa (Fleiss 1971) — chance-corrected agreement among
    * `m` raters assigning each item to one categorical label; the
    * multi-rater generalization of [[cohensKappa]] a curation pipeline
    * runs when THREE-plus heuristics vote on the same corpus (do the
    * gates agree beyond chance, or is the ensemble noise?).
    *
    * Input is long-format (item, rater, category); items with a rating
    * count ≠ m are dropped (Fleiss assumes a constant panel — partial
    * panels are a different statistic). The whole computation stays in
    * exact BIGINTs until three final divides: with S = Σᵢ Σⱼ n²ᵢⱼ and
    * column sums cⱼ,
    *   P̄  = (S − n·m) / (n·m·(m−1)),   P̄ₑ = (Σⱼ c²ⱼ) / (n·m)²,
    * so no per-item double ever sums across rows (order-free by
    * construction, not by DECIMAL discipline). kappa is NULL when
    * P̄ₑ = 1 (all ratings in one category).
    *
    * Scale: one (item, category) partial-agg, one item-level agg, one
    * k-row category agg — narrow rows only, no window, no collect.
    */
  def fleissKappa(df: DataFrame, itemCol: String, raterCol: String,
      catCol: String, m: Int): DataFrame = {
    require(m >= 2, "m must be >= 2")
    val r = df.select(col(itemCol).as("__i"),
        col(raterCol).as("__r"), col(catCol).cast("string").as("__c"))
      .filter(col("__i").isNotNull && col("__c").isNotNull)
    val nij = r.groupBy(col("__i"), col("__c")).agg(count(lit(1)).as("__n"))
    val item = nij.groupBy(col("__i"))
      .agg(sum(col("__n")).as("__mi"),
        sum(col("__n") * col("__n")).as("__s2"))
      .filter(col("__mi") === m)
    val tot = item.agg(count(lit(1)).as("n_items"), sum(col("__s2")).as("__ss"))
    val cj = nij.join(item.select(col("__i")), Seq("__i"))
      .groupBy(col("__c")).agg(sum(col("__n")).as("__cj"))
    val cat = cj.agg(count(lit(1)).as("k_categories"),
      sum(col("__cj") * col("__cj")).as("__cc"))
    val n = col("n_items").cast("double")
    val mD = lit(m.toDouble)
    val pbar = (col("__ss").cast("double") - n * mD) /
      (n * mD * lit((m - 1).toDouble))
    val pe = col("__cc").cast("double") / (n * mD * n * mD)
    tot.crossJoin(cat).select(col("n_items"), col("k_categories"),
      round(pbar, 4).as("p_bar"), round(pe, 4).as("p_e"),
      when(pe < 1.0, round((pbar - pe) / (lit(1.0) - pe), 4)).as("kappa"))
  }

  /** Expected calibration error (Naeini 2015 binned formulation) of a
    * [0,1] confidence score against a binary label — the scalar
    * companion of QualityRules.calibrationTable (q181): the table shows
    * the reliability diagram, ECE prices its total deviation
    * n-weighted, WITH the mean-confidence side the table omits (gap is
    * |accuracy − mean confidence| per bin, not accuracy vs the bin
    * midpoint). Run before a scorer's outputs become sampling weights.
    *
    * Equal-width bins on [0,1]; bin b's gap contribution
    * n_b·|acc_b − conf_b| folds EXACTLY to |Σy − Σs| (one BIGINT, one
    * DECIMAL(18,6) sum of the 6dp-rounded scores), so
    * ECE = Σ_b |Σy − Σs| / N never sums per-row doubles. Per-bin rows
    * plus the corpus ECE (same value on every row, joined from the
    * 1-row total). Null score/label rows are excluded; score 1.0
    * clamps into the top bin.
    *
    * Scale: one binned partial-agg over narrow (bin, score, label)
    * rows; the bins-row frame is bounded by `bins`.
    */
  def calibrationError(scored: DataFrame, scoreCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 1, "bins must be >= 1")
    val r = scored.select(
        round(col(scoreCol).cast("double"), 6).cast("decimal(18,6)").as("__s"),
        col(labelCol).cast("bigint").as("__y"))
      .filter(col("__s").isNotNull && col("__y").isNotNull)
    val binned = r.withColumn("__b",
      least(floor(col("__s").cast("double") * bins), lit(bins - 1L))
        .cast("bigint"))
    val perBin = binned.groupBy(col("__b"))
      .agg(count(lit(1)).as("n"),
        sum(col("__s")).cast("decimal(18,6)").as("__sc"),
        sum(col("__y")).as("__sy"))
    val totals = perBin.agg(sum(col("n")).as("__nt"),
      sum(abs(col("__sy").cast("decimal(18,6)") - col("__sc")))
        .cast("decimal(38,6)").as("__gap"))
    perBin.crossJoin(broadcast(totals)).select(
      col("__b").as("bin"), col("n"),
      round(col("__sc").cast("double") / col("n").cast("double"), 4)
        .as("conf"),
      round(col("__sy").cast("double") / col("n").cast("double"), 4)
        .as("acc"),
      round(col("__gap").cast("double") / col("__nt").cast("double"), 4)
        .as("ece"))
  }

  /** Kendall's tau-b between two numeric orderings of the same items,
    * per group — the pairwise-concordance complement of Profile.spearman
    * (rank-difference) and Retrieval.rankBiasedOverlap (top-weighted),
    * and the two-SCORER sibling of EventAnalytics.mannKendall (which
    * runs the same S statistic against TIME for trend): tau answers
    * "if x says A > B, how often does y agree?", the statistic quoted
    * when two scorers must be interchangeable, not just correlated.
    *
    * tau_b = (C − D) / √(P_x · P_y) where C/D are concordant and
    * discordant pair counts and P_x/P_y count pairs NOT tied on each
    * side — the pairwise identity that absorbs tau-b's tie terms
    * without per-group tie histograms. All four are exact BIGINTs from
    * one self-join; one final sqrt+divide. NULL when either side is
    * all-ties.
    *
    * Scale: the self-join is O(k²) per group — callers MUST bound the
    * per-group item count (the documented smallness contract, same as
    * the oracle-baseline all-pairs forms); the join shuffles on the
    * group key only.
    */
  def kendallTau(df: DataFrame, groupCol: String, idCol: String,
      xCol: String, yCol: String): DataFrame = {
    val r = df.select(col(groupCol).as("__g"), col(idCol).as("__id"),
        col(xCol).cast("double").as("__x"), col(yCol).cast("double").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    val l = r.select(col("__g"), col("__id").as("__il"),
      col("__x").as("__xl"), col("__y").as("__yl"))
    val rt = r.select(col("__g"), col("__id").as("__ir"),
      col("__x").as("__xr"), col("__y").as("__yr"))
    val dx = col("__xl") - col("__xr")
    val dy = col("__yl") - col("__yr")
    l.join(rt, Seq("__g")).filter(col("__il") < col("__ir"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(dx * dy > 0, 1L).otherwise(0L)).as("concordant"),
        sum(when(dx * dy < 0, 1L).otherwise(0L)).as("discordant"),
        sum(when(dx =!= 0, 1L).otherwise(0L)).as("__px"),
        sum(when(dy =!= 0, 1L).otherwise(0L)).as("__py"))
      .select(col("__g").as(groupCol), col("n_pairs"),
        col("concordant"), col("discordant"),
        when(col("__px") > 0 && col("__py") > 0,
          round((col("concordant") - col("discordant")).cast("double") /
            sqrt(col("__px").cast("double") * col("__py").cast("double")),
            4)).as("tau_b"))
  }
}
