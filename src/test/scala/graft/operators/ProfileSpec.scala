package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("profile: one row per column, exact stats, nulls counted") {
    val df = Seq(
      (1L, Some("aa"), Some(10)),
      (2L, None, Some(20)),
      (3L, Some("b"), None),
      (4L, Some("aa"), Some(20))).toDF("id", "s", "v")
    val p = Profile.profile(df, Seq("id", "s", "v")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("id", "s", "v"))
    val s = p("s")
    assert(s.getLong(1) == 4 && s.getLong(2) == 1) // n_rows, n_nulls
    assert(s.getLong(3) == 2) // distinct non-null: aa, b
    assert(s.getString(4) == "aa" && s.getString(5) == "b")
    assert(s.getLong(6) == 5) // 2 + 1 + 2 rendered chars
    val v = p("v")
    assert(v.getLong(3) == 2 && v.getString(4) == "10" && v.getString(5) == "20")
  }

  test("profile: approxDistinct plans without Expand and stays near exact") {
    val df = (0L until 5000L).map(i => (i, i % 97)).toDF("id", "k")
    val approx = Profile.profile(df, Seq("id", "k"), approxDistinct = true)
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx profile must not Expand:\n$plan")
    val exact = Profile.profile(df, Seq("id", "k"))
    assert(exact.queryExecution.executedPlan.toString.contains("Expand"))
    val byCol = approx.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(math.abs(byCol("k") - 97.0) / 97.0 < 0.1)
    assert(math.abs(byCol("id") - 5000.0) / 5000.0 < 0.1)
  }

  test("profile: hostile column names (quotes, commas, dots, backticks, spaces)") {
    val hostile = Seq("it's, tricky", "a.b c", "back`tick", "stack(2")
    var df = Seq((1L, "x", "y", "z", "w"), (2L, "x", null, "z", "q"))
      .toDF("id", "c1", "c2", "c3", "c4")
    hostile.zipWithIndex.foreach { case (h, i) =>
      df = df.withColumnRenamed(s"c${i + 1}", h)
    }
    val p = Profile.profile(df, hostile).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet == hostile.toSet)
    assert(p("it's, tricky").getLong(3) == 1)      // ndv of constant col
    assert(p("a.b c").getLong(2) == 1)             // one null
    assert(p("stack(2").getLong(3) == 2)           // w, q
  }

  test("profile: all-null column yields empty min/max and zero sum_len") {
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "s")
    val r = Profile.profile(df, Seq("s")).collect().head
    assert(r.getLong(2) == 2 && r.getLong(3) == 0)
    assert(r.isNullAt(4) && r.isNullAt(5) && r.getLong(6) == 0)
  }

  test("fdAudit: majority pick, violation counts, and the rhs tie-break") {
    val df = Seq(("x", "p"), ("x", "p"), ("x", "p"), ("x", "q"),
      ("y", "r"), ("y", "r"),
      ("z", "p"), ("z", "a")).toDF("lhs", "rhs")
    val out = Profile.fdAudit(df, "lhs", "rhs")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("x").getAs[Long]("n_rows") == 4L)
    assert(out("x").getAs[Long]("n_rhs") == 2L)
    assert(out("x").getAs[String]("majority_rhs") == "p")
    assert(out("x").getAs[Long]("n_violations") == 1L)
    assert(out("x").getAs[Double]("violation_rate") == 0.25)
    // a clean dependency: zero violations
    assert(out("y").getAs[Long]("n_rhs") == 1L &&
      out("y").getAs[Long]("n_violations") == 0L)
    // equal counts: majority is the ASCII-smaller rhs
    assert(out("z").getAs[String]("majority_rhs") == "a")
  }

  test("ksTest: identical distributions give D=0, disjoint give D=1") {
    // a and b share the same values; c is entirely above both
    val df = (Seq.fill(3)(("a", 1)) ++ Seq.fill(3)(("a", 2)) ++
      Seq.fill(3)(("b", 1)) ++ Seq.fill(3)(("b", 2)) ++
      Seq.fill(6)(("c", 9))).toDF("g", "v")
    val out = Profile.ksTest(df, "g", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    // c vs rest: at v=2 the rest's CDF is 1.0, c's is 0.0 -> D = 1
    assert(out("c").getAs[Double]("d_stat") == 1.0)
    assert(out("c").getAs[Int]("at_value") == 2)
    assert(out("c").getAs[Long]("n_group") == 6L &&
      out("c").getAs[Long]("n_rest") == 12L)
    // a vs rest (b identical + c above): sup at v=2 where
    // F_a = 1, F_rest = 6/12 -> D = 0.5
    assert(out("a").getAs[Double]("d_stat") == 0.5)
  }

  test("ksTest: sup lands on the exact cross-multiplied step, min v tie") {
    // g: {1,2}, rest: {1,3} -> steps: v=1: |1/2-1/2|=0; v=2: |1-1/2|=1/2;
    // v=3: |1-1| = 0. D=0.5 at v=2.
    val df = Seq(("g", 1), ("g", 2), ("r", 1), ("r", 3)).toDF("g", "v")
    val r = Profile.ksTest(df, "g", "v").collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r("g").getAs[Double]("d_stat") == 0.5)
    assert(r("g").getAs[Int]("at_value") == 2)
  }

  test("mutualInformation: exact dependency gives MI = H, independence 0") {
    // perfectly dependent: lhs determines rhs, both uniform over 2 values
    val dep = Seq(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q"))
      .toDF("l", "r")
    val d = Profile.mutualInformation(dep, "l", "r").collect().head
    val ln2 = math.round(math.log(2) * 1e4) / 1e4
    assert(d.getAs[Long]("n_rows") == 4L)
    assert(d.getAs[Double]("h_lhs") == ln2 && d.getAs[Double]("h_rhs") == ln2)
    assert(d.getAs[Double]("h_joint") == ln2)
    assert(d.getAs[Double]("mi") == ln2)
    assert(d.getAs[Double]("nmi") == 1.0)
    // independent uniform 2x2: joint = H(L) + H(R), MI = 0 (canonical 0.0,
    // never -0.0)
    val ind = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .toDF("l", "r")
    val i = Profile.mutualInformation(ind, "l", "r").collect().head
    assert(i.getAs[Double]("mi") == 0.0)
    assert((1.0 / i.getAs[Double]("mi")) > 0, "MI must not be -0.0")
    assert(i.getAs[Double]("nmi") == 0.0)
  }

  test("mutualInformation: constant marginal yields NULL nmi, null keys drop") {
    val df = Seq(("x", "p"), ("x", "q"), ("x", null), (null, "p"))
      .toDF("l", "r")
    val r = Profile.mutualInformation(df, "l", "r").collect().head
    assert(r.getAs[Long]("n_rows") == 2L) // only fully-non-null rows
    assert(r.getAs[Double]("h_lhs") == 0.0) // constant lhs
    assert(r.isNullAt(r.fieldIndex("nmi")))
  }

  test("benford: string-derived digits, exact counts, expectation shape") {
    // values 10..99 uniformly: first digits 1..9 appear 10 times each
    val df = (10 to 99).map(i => Tuple1(i)).toDF("v")
    val out = Profile.benford(df, "v").collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(out.size == 9)
    (1 to 9).foreach(d => assert(out(d).getAs[Long]("n_obs") == 10L))
    assert(out(1).getAs[Double]("obs_frac") == 0.1111)
    // Benford expectation for digit 1 is log10(2) = 0.3010
    assert(out(1).getAs[Double]("exp_frac") == 0.301)
    // uniform digits are far from Benford on digit 1: big contribution
    assert(out(1).getAs[Double]("chi2_part") > 10.0)
    // zero and negative values are excluded; UNOBSERVED digits still
    // emit rows (their n·exp_frac χ² contribution must not vanish)
    val out2 = Profile.benford(Seq(Tuple1(0), Tuple1(-5), Tuple1(7))
      .toDF("v"), "v").collect()
      .map(r => r.getInt(0) -> r.getAs[Long]("n_obs")).toMap
    assert(out2.keySet == (1 to 9).toSet)
    assert(out2(7) == 1L && out2.removed(7).values.forall(_ == 0L))
  }

  test("skewKurtosis: symmetric data has 0 skew; spike changes the sign") {
    val sym = (1 to 9).map(i => ("g", i.toLong, i)).toDF("g", "id", "v")
    val r = Profile.skewKurtosis(sym, "g", "v").collect().head
    assert(r.getAs[Double]("mean") == 5.0)
    assert(r.getAs[Double]("skewness") == 0.0)
    // uniform 1..9 is platykurtic: excess kurtosis < 0
    assert(r.getAs[Double]("excess_kurtosis") < 0.0)
    val skewed = ((1 to 9).map(i => ("g", i.toLong, 1)) :+ (("g", 10L, 100)))
      .toDF("g", "id", "v")
    val r2 = Profile.skewKurtosis(skewed, "g", "v").collect().head
    assert(r2.getAs[Double]("skewness") > 2.0) // long right tail
    // constant group (m2 = 0) is excluded
    val const = Seq(("c", 1L, 5), ("c", 2L, 5)).toDF("g", "id", "v")
    assert(Profile.skewKurtosis(const, "g", "v").count() == 0)
  }

  test("spearman: monotone gives 1, reversed gives -1, ties averaged") {
    import org.apache.spark.sql.functions.col
    // g=up: y = x² (monotone, nonlinear) → ρ = 1 exactly
    // g=dn: y = −x → ρ = −1 exactly
    val df = ((1 to 10).map(i => ("up", i, i * i)) ++
      (1 to 10).map(i => ("dn", i, -i))).toDF("g", "x", "y")
    val out = Profile.spearman(df, "g", col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("spearman_rho"))
      .toMap
    assert(out("up") == 1.0 && out("dn") == -1.0)
    // tie handling: x = (1,1,2,2), y = (1,2,3,4) — average ranks on x
    // give ρ = cor((1.5,1.5,3.5,3.5),(1,2,3,4)) = 2/√5 ≈ 0.8944
    val ties = Seq(("t", 1, 1), ("t", 1, 2), ("t", 2, 3), ("t", 2, 4))
      .toDF("g", "x", "y")
    val rho = Profile.spearman(ties, "g", col("x"), col("y"))
      .collect().head.getAs[Double]("spearman_rho")
    assert(rho == 0.8944)
    // constant side → excluded
    val const = Seq(("c", 1, 1), ("c", 2, 1)).toDF("g", "x", "y")
    assert(Profile.spearman(const, "g", col("x"), col("y")).count() == 0)
  }

  test("madOutliers: integer cutoff flags the spike, degenerate group guarded") {
    // g=a: nine values 100..108 (median 104, MAD 2) + one spike 500:
    // modified z of the spike = 0.6745*(500-104)/2 >> 3.5 -> 1 outlier;
    // the inliers' max |x-med| = 4 -> z = 1.349, clean
    val a = ((100 to 108).map(v => ("a", v)) :+ ("a", 500))
    // g=b: all equal -> MAD 0 -> degenerate, zero outliers by contract
    val b = (1 to 5).map(_ => ("b", 7))
    val df = (a ++ b).toDF("g", "v")
    val out = Profile.madOutliers(df, "g", col("v"), scale = 1)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4),
          r.getBoolean(5)))).toMap
    assert(out("a") == ((10L, 104.5, 2.5, 1L, false)))
    assert(out("b") == ((5L, 7.0, 0.0, 0L, true)))
  }

  test("winsorizedMean: exact nearest-rank clamps tame the tails") {
    import spark.implicits._
    // group a: 1..20 (cents: 100..2000); p05 rank = ceil(1)=1 → 100,
    // p95 rank = ceil(19)=19 → 1900; clamps: none below, 2000→1900
    // winsorized sum = (100+...+1900) + 1900 = 20900+... compute below
    val rows = (1 to 20).map(i => ("a", i.toDouble)) ++
      Seq(("b", 5.0), ("b", 1000000.0)) // tiny group: lo==hi clamp world
    val df = rows.toDF("g", "v")
    val out = Profile.winsorizedMean(df, "g",
      round($"v" * 100, 0).cast("long"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getAs[Double]("p_lo"), r.getAs[Double]("p_hi"),
          r.getLong(4), r.getAs[Double]("winsorized_mean")))).toMap
    val sumA = (1 to 19).map(_ * 100).sum + 1900
    assert(out("a") == ((20L, 1.0, 19.0,
      1L, math.rint(sumA / 20.0 / 100 * 10000) / 10000)))
    // n=2: p05 rank = ceil(0.1)=1 → 5.0; p95 rank = ceil(1.9)=2 → 1e6;
    // nothing clamps (both values are their own bounds)
    assert(out("b")._4 == 0L)
    assert(out("b")._5 == math.rint((5.0 + 1000000.0) / 2 * 10000) / 10000)
  }

  test("kruskalWallis: hand-computed H, tie correction, all-ties NULL") {
    import spark.implicits._
    // A: {1,2}, B: {3,4} → ranks 1..4, R_A=3, R_B=7, H = 0.6·29 − 15 = 2.4
    val plain = Seq(("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0))
      .toDF("g", "v")
    val p = Profile.kruskalWallis(plain, "g", "v").collect().head
    assert(p.getAs[Long]("n") == 4L && p.getAs[Long]("n_groups") == 2L)
    assert(p.getAs[Double]("h") == 2.4)
    assert(p.getAs[Double]("h_corrected") == 2.4) // no ties
    // A: {1,1}, B: {2,2} → midranks 1.5/3.5, same rank sums → H = 2.4;
    // ties Σ(t³−t) = 12, N³−N = 60 → C = 0.8 → H_c = 3.0
    val tied = Seq(("A", 1.0), ("A", 1.0), ("B", 2.0), ("B", 2.0))
      .toDF("g", "v")
    val t = Profile.kruskalWallis(tied, "g", "v").collect().head
    assert(t.getAs[Double]("h") == 2.4)
    assert(t.getAs[Double]("h_corrected") == 3.0)
    // every value identical → correction 0 → H_c NULL
    val all = Seq(("A", 5.0), ("B", 5.0), ("B", 5.0)).toDF("g", "v")
    val a = Profile.kruskalWallis(all, "g", "v").collect().head
    assert(a.isNullAt(a.fieldIndex("h_corrected")))
  }

  test("halfSampleSe: constant values give SE 0; replicates complete") {
    import spark.implicits._
    val df = (1L to 200L).map(i => ("g", i, 42.0)).toDF("g", "id", "v")
    val r = Profile.halfSampleSe(df, "g", "id", "v", replicates = 16)
      .collect().head
    assert(r.getAs[Long]("n") == 200L)
    assert(r.getAs[Double]("mean") == 42.0)
    assert(r.getAs[Long]("n_replicates") == 16L)
    assert(r.getAs[Double]("se_half_sample") == 0.0)
    // varying values: SE strictly positive, deterministic run to run
    val df2 = (1L to 200L).map(i => ("g", i, i.toDouble)).toDF("g", "id", "v")
    val a = Profile.halfSampleSe(df2, "g", "id", "v").collect().head
      .getAs[Double]("se_half_sample")
    val b = Profile.halfSampleSe(df2, "g", "id", "v").collect().head
      .getAs[Double]("se_half_sample")
    assert(a > 0.0 && a == b)
  }

  test("emd1d: shifted distribution moves exactly the shift; identical → 0") {
    import spark.implicits._
    // ref {0, 10}; A identical → W1 = 0; B = ref + 10 → W1 = 10
    val df = Seq(("r", 0L), ("r", 10L), ("A", 0L), ("A", 10L),
      ("B", 10L), ("B", 20L)).toDF("g", "v")
    val out = Profile.emd1d(df, "g", "v", refGroup = "r").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("w1")).toMap
    assert(out == Map("A" -> 0.0, "B" -> 10.0))
  }

  test("emd1d: unequal sample sizes stay exact (rational CDF gaps)") {
    import spark.implicits._
    // ref {0,0,10} (n=3); C {0,10} (n=2): segment [0,10): |1·3 − 2·2|
    // ·10 = 10 → W1 = 10/6 = 1.6667
    val df = Seq(("r", 0L), ("r", 0L), ("r", 10L), ("C", 0L), ("C", 10L))
      .toDF("g", "v")
    val out = Profile.emd1d(df, "g", "v", "r").collect().head
    assert(out.getAs[Long]("n") == 2L && out.getAs[Long]("n_ref") == 3L)
    assert(out.getAs[Double]("w1") == 1.6667)
  }

  test("aggState merge equals direct recompute, disjoint keys survive") {
    import spark.implicits._
    val old = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0)).toDF("k", "v")
    val delta = Seq(("b", 20.0), ("c", 5.0)).toDF("k", "v")
    val merged = Profile.mergeAggState(
      Profile.aggState(old, "k", "v"), Profile.aggState(delta, "k", "v"),
      "k").collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Double]("sum_val"),
          r.getAs[Double]("min_val"), r.getAs[Double]("max_val"))).toMap
    assert(merged("a") == ((2L, 4.0, 1.0, 3.0)))
    assert(merged("b") == ((2L, 30.0, 10.0, 20.0)))
    assert(merged("c") == ((1L, 5.0, 5.0, 5.0)))
    val direct = Profile.aggState(old.unionAll(delta), "k", "v")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(direct == merged.view.mapValues(_._1).toMap)
  }

  test("foldAggState composes: two folds equal one three-way recompute bit-exactly") {
    import spark.implicits._
    val d1 = Seq(("a", 1.25), ("b", 10.0)).toDF("k", "v")
    val d2 = Seq(("a", 3.5), ("c", 5.0)).toDF("k", "v")
    val d3 = Seq(("a", -0.75), ("b", 2.0)).toDF("k", "v")
    // pre-fix, mergeAggState's rendered output couldn't be merged again
    // (renamed columns, Σ degraded to double)
    val folded = Profile.foldAggState(
      Profile.foldAggState(Profile.aggState(d1, "k", "v"),
        Profile.aggState(d2, "k", "v")),
      Profile.aggState(d3, "k", "v"))
    val direct = Profile.aggState(d1.unionAll(d2).unionAll(d3), "k", "v")
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n"), r.getAs[java.math.BigDecimal]("__sum"),
          r.getAs[java.math.BigDecimal]("__min"),
          r.getAs[java.math.BigDecimal]("__max")))).toMap
    assert(snap(folded) == snap(direct))
  }

  test("wilcoxonSignedRank: hand-traced midranks, ties, zero-diff drop") {
    // diffs y-x: +1,+1,-1,+2,+3,0 -> zero drops; |d| groups:
    // 1 (t=3, pos=2) midrank 2.0; 2 (t=1) midrank 4; 3 (t=1) midrank 5
    // W+ = 2*2.0 + 4 + 5 = 13; n=5, E=7.5
    // Var = 5*6*11/24 - (27-3)/48 = 13.75 - 0.5 = 13.25
    val df = Seq((0L, 1L), (0L, 1L), (1L, 0L), (0L, 2L), (0L, 3L), (4L, 4L))
      .toDF("x", "y")
    val r = Profile.wilcoxonSignedRank(df, "x", "y").collect().head
    assert(r.getAs[Long]("n_pairs") == 5L)
    assert(r.getAs[Double]("w_plus") == 13.0)
    assert(r.getAs[Double]("z") == (13.0 - 7.5) / math.sqrt(13.25))
  }

  test("wilcoxonSignedRank: symmetric diffs give W+ = E, z = 0") {
    // +1 and -1 in equal numbers: W+ = half the rank sum exactly
    val df = Seq((0L, 1L), (1L, 0L), (0L, 2L), (2L, 0L)).toDF("x", "y")
    val r = Profile.wilcoxonSignedRank(df, "x", "y").collect().head
    assert(r.getAs[Long]("n_pairs") == 4L)
    assert(r.getAs[Double]("w_plus") == 5.0) // 1.5 + 3.5
    assert(r.getAs[Double]("z") == 0.0)
  }

  test("exactTopKRescan: exact counts, certificate, deterministic order on skew") {
    // 3 hot keys (40/30/20 rows) + 60 singletons; capacity 20 >> hot keys
    val rows = Seq.fill(40)(1L) ++ Seq.fill(30)(2L) ++ Seq.fill(20)(3L) ++
      (100L until 160L)
    val df = rows.map(Tuple1(_)).toDF("k")
    val out = Profile.exactTopKRescan(df, "k", k = 3, capacity = 20)
      .collect()
    assert(out.map(_.getAs[Long]("item")).toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_.getAs[Long]("exact_count")).toSeq == Seq(40L, 30L, 20L))
    // n = 150; kth count 20 * capacity 20 = 400 > 150 -> certified
    assert(out.forall(_.getAs[Boolean]("provably_complete")))
    // uncertifiable case: k-th count below n/capacity flags false
    val flat = (1L to 100L).map(Tuple1(_)).toDF("k")
    val f = Profile.exactTopKRescan(flat, "k", k = 2, capacity = 10)
      .collect()
    assert(f.forall(!_.getAs[Boolean]("provably_complete")))
  }

  test("friedman: hand-computed tied/untied statistic; all-tied rows null") {
    import org.apache.spark.sql.functions.col
    // untied 3 items x 3 treatments, col 0 always largest:
    // rows (3,1,2),(5,2,4),(9,1,4) -> ranks (3,1,2) each
    // R = (9,3,6), mean 6, num = 9+9+0 = 18
    // A = 3*(9+1+4) = 42; den = 42 - 3*3*16/4 = 6; chi2 = 2*18/6 = 6
    val df = Seq((3L, 1L, 2L), (5L, 2L, 4L), (9L, 1L, 4L))
      .toDF("a", "b", "c")
    val r = Profile.friedman(df, Seq(col("a"), col("b"), col("c")))
      .collect().head
    assert(r.getAs[Long]("n_items") == 3L)
    assert(r.getAs[Double]("chi2_f") == 6.0)
    assert(r.getAs[Int]("df") == 2)
    // ties: row (2,2,1) -> ranks (2.5, 2.5, 1); add untied (3,1,2)
    // R = (5.5, 3.5, 3), mean 4, num = 2.25 + 0.25 + 1 = 3.5
    // A = (6.25+6.25+1) + (9+1+4) = 27.5; den = 27.5 - 24 = 3.5 -> chi2 = 2
    val tied = Seq((2L, 2L, 1L), (3L, 1L, 2L)).toDF("a", "b", "c")
    val rt = Profile.friedman(tied, Seq(col("a"), col("b"), col("c")))
      .collect().head
    assert(rt.getAs[Double]("chi2_f") == 2.0)
    // every item fully tied: denominator 0 -> null
    val flat = Seq((1L, 1L, 1L), (7L, 7L, 7L)).toDF("a", "b", "c")
    val rf = Profile.friedman(flat, Seq(col("a"), col("b"), col("c")))
      .collect().head
    assert(rf.isNullAt(rf.fieldIndex("chi2_f")))
  }
}
