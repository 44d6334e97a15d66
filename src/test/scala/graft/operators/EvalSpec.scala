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
}
