package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ResampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("LOCF grid: aligned buckets, carried values, pre-first-obs nulls") {
    val obs = Seq(
      (1L, 103L, 10.0), (1L, 205L, 20.0), (1L, 450L, 45.0),
      (2L, 999L, 9.9)
    ).toDF("k", "ts", "v")
    val got = Resample.locf(obs, "k", "ts", "v", step = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    // key 1: grid 100..450 step 100 → 100,200,300,400
    assert(got((1L, 100L)).isEmpty)          // before first obs @103
    assert(got((1L, 200L)).contains(10.0))   // obs@103 carried
    assert(got((1L, 300L)).contains(20.0))   // obs@205 carried
    assert(got((1L, 400L)).contains(20.0))   // still carried
    assert(!got.contains((1L, 500L)))        // grid ends at max ts 450
    // key 2: single grid point at 900, before obs @999 → null
    assert(got((2L, 900L)).isEmpty)
    assert(got.size == 5)
  }
}
