package graft.operators

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
}
