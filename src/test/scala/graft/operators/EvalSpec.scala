package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("prCurve: hand-computed sweep, one row per distinct score") {
    // scores descending: 0.9(+), 0.8(-), 0.7(+), 0.7(+), 0.5(-)  P=3
    val df = Seq((0.9, 1L), (0.8, 0L), (0.7, 1L), (0.7, 1L), (0.5, 0L))
      .toDF("score", "y")
    val out = Eval.prCurve(df, "score", "y").collect()
      .map(r => r.getDouble(0) -> r).toMap
    assert(out.size == 4)
    val t9 = out(0.9) // tp=1 pp=1
    assert(t9.getAs[Long]("tp") == 1L && t9.getAs[Long]("fp") == 0L &&
      t9.getAs[Long]("fn") == 2L)
    assert(t9.getAs[Double]("prec") == 1.0)
    assert(t9.getAs[Double]("recall") == 0.3333)
    assert(t9.getAs[Double]("f1") == 0.5) // 2*1/(1+3)
    val t7 = out(0.7) // tp=3 pp=4
    assert(t7.getAs[Long]("tp") == 3L && t7.getAs[Long]("fp") == 1L &&
      t7.getAs[Long]("fn") == 0L)
    assert(t7.getAs[Double]("prec") == 0.75 &&
      t7.getAs[Double]("recall") == 1.0)
    assert(t7.getAs[Double]("f1") == 0.8571) // 6/7
    val t5 = out(0.5) // everything predicted positive
    assert(t5.getAs[Long]("tp") == 3L && t5.getAs[Long]("fp") == 2L)
    assert(t5.getAs[Double]("recall") == 1.0 &&
      t5.getAs[Double]("prec") == 0.6)
  }

  test("prCurve: cumulative window runs on the aggregated frame") {
    val df = (0 until 4096).map(i => (i % 8 * 0.1, (i % 2).toLong))
      .toDF("score", "y")
    val out = Eval.prCurve(df, "score", "y")
    assert(out.count() == 8)
    // recall is monotone non-decreasing as the threshold drops
    val recalls = out.orderBy(col("threshold").desc)
      .collect().map(_.getAs[Double]("recall"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b })
  }

  test("bradleyTerry: dominant model scores highest, symmetric data ties") {
    // A beats B 9/10, B beats C 9/10, A beats C 9/10 → strict order
    val matches = (
      Seq.fill(9)(("A", "B", true)) ++ Seq.fill(1)(("A", "B", false)) ++
      Seq.fill(9)(("B", "C", true)) ++ Seq.fill(1)(("B", "C", false)) ++
      Seq.fill(9)(("A", "C", true)) ++ Seq.fill(1)(("A", "C", false))
    ).toDF("a", "b", "a_wins")
    val s = Eval.bradleyTerry(matches, "a", "b", "a_wins")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("bt_score")).toMap
    assert(s("A") > s("B") && s("B") > s("C"), s.toString)
    // perfectly symmetric round robin → equal strengths
    val sym = Seq(("A", "B", true), ("A", "B", false),
      ("B", "C", true), ("B", "C", false),
      ("A", "C", true), ("A", "C", false)).toDF("a", "b", "a_wins")
    val t = Eval.bradleyTerry(sym, "a", "b", "a_wins")
      .collect().map(r => r.getAs[Double]("bt_score")).distinct
    assert(t.length == 1, t.toSeq.toString)
    // self-matches are dropped, not counted
    val selfy = (Seq(("A", "A", true)) ++ Seq(("A", "B", true),
      ("A", "B", false))).toDF("a", "b", "a_wins")
    val u = Eval.bradleyTerry(selfy, "a", "b", "a_wins")
      .collect().map(r => r.getAs[Double]("bt_score")).distinct
    assert(u.length == 1)
  }

  test("cohensKappa: perfect 1.0, chance-level 0, null rows excluded, degenerate null") {
    import org.apache.spark.sql.functions.col
    def kappa(rows: Seq[(Option[Boolean], Option[Boolean])]) =
      Eval.cohensKappa(rows.toDF("a", "b"), col("a"), col("b"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4),
          if (r.isNullAt(7)) None else Some(r.getDouble(7)))).head
    // perfect agreement (mixed marginals so pe < 1)
    val p = kappa(Seq((Some(true), Some(true)), (Some(false), Some(false)),
      (Some(true), Some(true))))
    assert(p == ((3L, 2L, 1L, Some(1.0))))
    // independence: a and b uncorrelated 50/50 → po = pe = 0.5 → kappa 0
    val c = kappa(Seq(
      (Some(true), Some(true)), (Some(true), Some(false)),
      (Some(false), Some(true)), (Some(false), Some(false))))
    assert(c._4.contains(0.0))
    // null raters excluded from every count
    val n = kappa(Seq((Some(true), Some(true)), (None, Some(true)),
      (Some(false), None), (Some(false), Some(false))))
    assert(n._1 == 2L)
    // single-cell table: pe = 1 → kappa undefined (NULL)
    val d = kappa(Seq((Some(true), Some(true)), (Some(true), Some(true))))
    assert(d._4.isEmpty)
  }

  test("fleissKappa: hand-computed two-item panel, drops wrong-size items") {
    // item A rated (x, x, y): S_A = 4 + 1 = 5; item B (x, x, x): S_B = 9
    // P̄ = (14 − 6) / 12 = 2/3; c_x = 5, c_y = 1 → P̄e = 26/36 = 13/18
    // kappa = (2/3 − 13/18) / (5/18) = −0.2
    val long = Seq(
      ("A", "r1", "x"), ("A", "r2", "x"), ("A", "r3", "y"),
      ("B", "r1", "x"), ("B", "r2", "x"), ("B", "r3", "x"),
      // item C has only two ratings → dropped (panel must be m = 3)
      ("C", "r1", "y"), ("C", "r2", "y")
    ).toDF("item", "rater", "cat")
    val r = Eval.fleissKappa(long, "item", "rater", "cat", m = 3).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_items") == 2L)
    assert(r.head.getAs[Long]("k_categories") == 2L)
    assert(r.head.getAs[Double]("p_bar") == 0.6667)
    assert(r.head.getAs[Double]("p_e") == 0.7222)
    assert(r.head.getAs[Double]("kappa") == -0.2)
  }

  test("fleissKappa: unanimous single category → pe = 1, kappa NULL") {
    val long = Seq(("A", "r1", "x"), ("A", "r2", "x"),
      ("B", "r1", "x"), ("B", "r2", "x")).toDF("item", "rater", "cat")
    val r = Eval.fleissKappa(long, "item", "rater", "cat", m = 2).collect()
    assert(r.head.getAs[Double]("p_bar") == 1.0)
    assert(r.head.isNullAt(r.head.fieldIndex("kappa")))
  }

  test("calibrationError: hand-computed bins, 1.0 clamps into top bin") {
    // bin0: (0.05, 0) gap .05 | bin1: (0.15, 1), (0.15, 0) gap .7
    // bin9: (0.95, 1), (1.0, 1) gap .05 → ECE = 0.8 / 5 = 0.16
    val df = Seq((0.05, 0L), (0.15, 1L), (0.15, 0L), (0.95, 1L),
      (1.0, 1L)).toDF("score", "y")
    val out = Eval.calibrationError(df, "score", "y", bins = 10)
      .collect().map(r => r.getAs[Long]("bin") -> r).toMap
    assert(out.keySet == Set(0L, 1L, 9L))
    assert(out(1L).getAs[Long]("n") == 2L)
    assert(out(1L).getAs[Double]("conf") == 0.15)
    assert(out(1L).getAs[Double]("acc") == 0.5)
    assert(out(9L).getAs[Long]("n") == 2L)
    assert(out(9L).getAs[Double]("conf") == 0.975)
    assert(out(9L).getAs[Double]("acc") == 1.0)
    assert(out.values.forall(_.getAs[Double]("ece") == 0.16))
  }

  test("kendallTau: perfect agreement, reversal, ties, degenerate side") {
    def tau(rows: Seq[(String, Long, Double, Double)]): Map[String, Row] =
      Eval.kendallTau(rows.toDF("g", "id", "x", "y"), "g", "id", "x", "y")
        .collect().map(r => r.getAs[String]("g") -> r).toMap
    val out = tau(Seq(
      // g1: identical orders → tau 1; g2: reversed → −1
      ("g1", 1L, 1.0, 10.0), ("g1", 2L, 2.0, 20.0), ("g1", 3L, 3.0, 30.0),
      ("g2", 1L, 1.0, 30.0), ("g2", 2L, 2.0, 20.0), ("g2", 3L, 3.0, 10.0),
      // g3: x ties absorb into P_x → C=2, D=0, Px=2, Py=3 → 2/√6
      ("g3", 1L, 1.0, 1.0), ("g3", 2L, 1.0, 2.0), ("g3", 3L, 2.0, 3.0),
      // g4: x constant → P_x = 0 → tau NULL
      ("g4", 1L, 5.0, 1.0), ("g4", 2L, 5.0, 2.0)))
    assert(out("g1").getAs[Double]("tau_b") == 1.0)
    assert(out("g1").getAs[Long]("concordant") == 3L)
    assert(out("g2").getAs[Double]("tau_b") == -1.0)
    assert(out("g3").getAs[Double]("tau_b") == 0.8165)
    assert(out("g4").isNullAt(out("g4").fieldIndex("tau_b")))
  }

  test("passAtK: hand-computed estimator, short tasks excluded per k") {
    // task A: n=4, c=2 → pass@1 = 1 − 2/4 = 0.5; pass@3: term j=2 hits
    // (n−c−j) = 0 → product 0 → pass 1. task B: n=2, c=0 → pass@1 = 0,
    // excluded at k=3 (n < k).
    val df = Seq(("A", true), ("A", true), ("A", false), ("A", false),
      ("B", false), ("B", false)).toDF("task", "ok")
    val out = Eval.passAtK(df, "task", "ok", ks = Seq(1, 3)).collect()
      .map(r => r.getAs[Long]("k") -> r).toMap
    assert(out(1L).getAs[Long]("n_tasks") == 2L)
    assert(out(1L).getAs[Double]("pass_at_k") == 0.25)
    assert(out(3L).getAs[Long]("n_tasks") == 1L)
    assert(out(3L).getAs[Double]("pass_at_k") == 1.0)
  }

  test("brierDecomposition: hand-computed bins, exact Murphy identity") {
    // bin2: (0.2,0),(0.2,1); bin8: (0.8,1),(0.8,1). N=4, ΣY=3.
    // brier = (0.04+0.64+0.04+0.04)/4 = 0.19
    // rel = ((0.4−1)²/2 + (1.6−2)²/2)/4 = 0.26/4 = 0.065
    // res = ((1·4−2·3)²/32 + (2·4−2·3)²/32)/4 = 0.25/4 = 0.0625
    // unc = 0.75·0.25 = 0.1875; rel − res + unc = 0.19 = brier (exact
    // because within-bin scores are constant)
    val df = Seq((0.2, 0L), (0.2, 1L), (0.8, 1L), (0.8, 1L))
      .toDF("score", "y")
    val r = Eval.brierDecomposition(df, "score", "y", bins = 10).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n") == 4L)
    assert(r.head.getAs[Long]("n_bins_used") == 2L)
    assert(r.head.getAs[Double]("brier") == 0.19)
    assert(r.head.getAs[Double]("reliability") == 0.065)
    assert(r.head.getAs[Double]("resolution") == 0.0625)
    assert(r.head.getAs[Double]("uncertainty") == 0.1875)
  }

  test("confusionStats: hand-computed 2×2 with MCC, degenerate NULLs") {
    // g1: tp=2 fp=1 fn=1 tn=2 → mcc = (4−1)/√81 = 1/3
    val df = Seq(
      ("g1", true, true), ("g1", true, true), ("g1", true, false),
      ("g1", false, true), ("g1", false, false), ("g1", false, false),
      // g2: constant-true predictor → tn = fn = 0 → mcc NULL, recall 1
      ("g2", true, true), ("g2", true, false)).toDF("g", "p", "y")
    val out = Eval.confusionStats(df, "g", col("p"), col("y")).collect()
      .map(r => r.getAs[String]("g") -> r).toMap
    val g1 = out("g1")
    assert(g1.getAs[Long]("tp") == 2L && g1.getAs[Long]("fp") == 1L &&
      g1.getAs[Long]("fn") == 1L && g1.getAs[Long]("tn") == 2L)
    assert(g1.getAs[Double]("accuracy") == 0.6667)
    assert(g1.getAs[Double]("precision") == 0.6667)
    assert(g1.getAs[Double]("recall") == 0.6667)
    assert(g1.getAs[Double]("f1") == 0.6667)
    assert(g1.getAs[Double]("mcc") == 0.3333)
    val g2 = out("g2")
    assert(g2.isNullAt(g2.fieldIndex("mcc")))
    assert(g2.getAs[Double]("recall") == 1.0)
    assert(g2.getAs[Double]("precision") == 0.5)
  }

  test("bhAdjust: hand-computed step-up, monotone adjusted values") {
    // m=4, sorted p: .01 .02 .04 .5 → raw m·p/i: .04 .04 .0533 .5;
    // suffix-min: .04 .04 .053333 .5 → a, b, c discoveries at 0.1
    val df = Seq(("a", 0.01), ("b", 0.02), ("c", 0.04), ("d", 0.5))
      .toDF("exp", "p")
    val out = Eval.bhAdjust(df, "exp", "p", alpha = 0.10).collect()
      .map(r => r.getAs[String]("exp") -> r).toMap
    assert(out("a").getAs[Long]("rank") == 1L)
    assert(out("a").getAs[Double]("p_adjusted") == 0.04)
    assert(out("b").getAs[Double]("p_adjusted") == 0.04)
    assert(out("c").getAs[Double]("p_adjusted") == 0.053333)
    assert(out("d").getAs[Double]("p_adjusted") == 0.5)
    assert(out("a").getAs[Boolean]("discovery"))
    assert(out("c").getAs[Boolean]("discovery"))
    assert(!out("d").getAs[Boolean]("discovery"))
  }

  test("bhAdjust: adjusted p clamps at 1 and ties break by id") {
    val df = Seq(("x", 0.9), ("y", 0.9)).toDF("exp", "p")
    val out = Eval.bhAdjust(df, "exp", "p").collect()
      .map(r => r.getAs[String]("exp") -> r).toMap
    assert(out("x").getAs[Long]("rank") == 1L)
    assert(out("y").getAs[Long]("rank") == 2L)
    // rank1: min(2·0.9/1 → clamp 1, 2·0.9/2 = 0.9) = 0.9
    assert(out("x").getAs[Double]("p_adjusted") == 0.9)
    assert(out("y").getAs[Double]("p_adjusted") == 0.9)
  }

  test("krippendorffAlpha: incomplete panel, singleton units dropped") {
    // unit1 (x,x): term 0; unit2 (x,y): term (4−2)/1 = 2; unit3 has one
    // rating → dropped. n = 4, Do = 2/4 = 0.5; marginals x:3 y:1 →
    // De = (16−10)/12 = 0.5 → alpha = 0
    val df = Seq(("u1", "r1", "x"), ("u1", "r2", "x"),
      ("u2", "r1", "x"), ("u2", "r2", "y"),
      ("u3", "r1", "y")).toDF("u", "r", "v")
    val out = Eval.krippendorffAlpha(df, "u", "r", "v").collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_units") == 2L)
    assert(out.head.getAs[Long]("n_values") == 4L)
    assert(out.head.getAs[Long]("k_categories") == 2L)
    assert(out.head.getAs[Double]("d_o") == 0.5)
    assert(out.head.getAs[Double]("d_e") == 0.5)
    assert(out.head.getAs[Double]("alpha") == 0.0)
  }

  test("conformalCoverage: hand-traced rank, coverage and set sizes") {
    // calibration nonconf {0.1, 0.2, 0.3, 0.4} → r = min(⌈5·9/10⌉, 4)
    // = 4 → q̂ = 0.4. test: (s=.65, y) covered, set {y}; (s=.5, ¬y)
    // nonconf .5 > q̂ uncovered, empty set → coverage .5, avg size .5
    val df = Seq(
      ("g", 0.9, true, true), ("g", 0.8, true, true),
      ("g", 0.7, true, true), ("g", 0.6, true, true),
      ("g", 0.65, true, false), ("g", 0.5, false, false)
    ).toDF("g", "s", "y", "cal")
    val r = Eval.conformalCoverage(df, "g", col("s"), col("y"), col("cal"),
      alphaNum = 1, alphaDen = 10).collect().head
    assert(r.getAs[Long]("n_cal") == 4L)
    assert(r.getAs[Double]("q_hat") == 0.4)
    assert(r.getAs[Long]("n_test") == 2L)
    assert(r.getAs[Double]("coverage") == 0.5)
    assert(r.getAs[Double]("avg_set_size") == 0.5)
  }

  test("krippendorffAlpha: perfect agreement → alpha 1") {
    val df = Seq(("u1", "r1", "x"), ("u1", "r2", "x"),
      ("u2", "r1", "y"), ("u2", "r2", "y")).toDF("u", "r", "v")
    val out = Eval.krippendorffAlpha(df, "u", "r", "v").collect()
    assert(out.head.getAs[Double]("d_o") == 0.0)
    assert(out.head.getAs[Double]("alpha") == 1.0)
  }

  test("mcnemar: hand-counted 2x2, continuity correction, null gating") {
    import org.apache.spark.sql.functions.col
    // a,b: 3x(T,T), 4x(T,F), 1x(F,T), 2x(F,F) -> chi2 = (4-1)^2/5 = 1.8
    // corrected: (|3|-1)^2/5 = 0.8; a null pair row is excluded
    val rows = Seq.fill(3)((true, true)) ++ Seq.fill(4)((true, false)) ++
      Seq((false, true)) ++ Seq.fill(2)((false, false))
    val df = rows.toDF("a", "b").unionAll(
      Seq((true, true)).toDF("a", "b")
        .select(col("a"), org.apache.spark.sql.functions
          .lit(null).cast("boolean").as("b")))
    val r = Eval.mcnemar(df, col("a"), col("b")).collect().head
    assert(r.getAs[Long]("n11") == 3L && r.getAs[Long]("n10") == 4L)
    assert(r.getAs[Long]("n01") == 1L && r.getAs[Long]("n00") == 2L)
    assert(r.getAs[Double]("chi2") == 9.0 / 5.0)
    assert(r.getAs[Double]("chi2_corrected") == 4.0 / 5.0)
  }

  test("mcnemar: zero discordance nulls the statistic") {
    import org.apache.spark.sql.functions.col
    val df = Seq((true, true), (false, false)).toDF("a", "b")
    val r = Eval.mcnemar(df, col("a"), col("b")).collect().head
    assert(r.isNullAt(r.fieldIndex("chi2")))
    assert(r.isNullAt(r.fieldIndex("chi2_corrected")))
  }

  test("cochranQ: hand-computed all-integer statistic; null row exclusion") {
    import org.apache.spark.sql.functions.{col, lit}
    // 4 items x 3 gates: rows (1,1,1),(1,0,0),(1,1,0),(0,0,0)
    // C = (3,2,1), N = 6, sumR2 = 9+1+4+0 = 14
    // Q = 2*(3*(9+4+1) - 36) / (3*6 - 14) = 2*6/4 = 3.0
    val df = Seq((true, true, true), (true, false, false),
      (true, true, false), (false, false, false)).toDF("a", "b", "c")
    val r = Eval.cochranQ(df, Seq(col("a"), col("b"), col("c")))
      .collect().head
    assert(r.getAs[Long]("n_items") == 4L)
    assert(r.getAs[Int]("k_gates") == 3 && r.getAs[Int]("df") == 2)
    assert(r.getAs[Double]("q_stat") == 3.0)
    // all-constant rows: denominator 0 -> null Q
    val const = Seq((true, true), (false, false)).toDF("a", "b")
    val rc = Eval.cochranQ(const, Seq(col("a"), col("b"))).collect().head
    assert(rc.isNullAt(rc.fieldIndex("q_stat")))
    // a null gate value excludes the row listwise
    val withNull = df.unionAll(Seq((true, true, true)).toDF("a", "b", "c")
      .select(col("a"), lit(null).cast("boolean").as("b"), col("c")))
    assert(Eval.cochranQ(withNull, Seq(col("a"), col("b"), col("c")))
      .collect().head.getAs[Long]("n_items") == 4L)
  }
}
