package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val quotes = Seq( // (sym, ts, px)
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
    ("B", 15L, 10.0)
  ).toDF("sym", "ts", "px")

  private val trades = Seq( // (sym, ts, qty)
    ("A", 5L, 100L),   // before any quote → null
    ("A", 20L, 200L),  // equal ts → that quote (<= semantics)
    ("A", 25L, 300L),  // between → quote@20
    ("A", 99L, 400L),  // after all → quote@30
    ("B", 16L, 500L),  // → quote@15
    ("C", 50L, 600L)   // key with no quotes → null
  ).toDF("sym", "ts", "qty")

  test("as-of semantics: latest right with ts <= left ts, per key") {
    val got = AsOfJoin.asOf(trades, quotes, Seq("sym"), "ts", "ts",
      Seq(("px", "last_px")))
      .collect().map(r => (r.getAs[String]("sym"), r.getAs[Long]("ts")) ->
        Option(r.getAs[Any]("last_px"))).toMap
    assert(got(("A", 5L)).isEmpty)
    assert(got(("A", 20L)).contains(2.0))
    assert(got(("A", 25L)).contains(2.0))
    assert(got(("A", 99L)).contains(3.0))
    assert(got(("B", 16L)).contains(10.0))
    assert(got(("C", 50L)).isEmpty)
  }

  test("tolerance bounds the look-back") {
    val got = AsOfJoin.asOf(trades, quotes, Seq("sym"), "ts", "ts",
      Seq(("px", "last_px")), tolerance = Some(lit(6L)))
      .collect().map(r => (r.getAs[String]("sym"), r.getAs[Long]("ts")) ->
        Option(r.getAs[Any]("last_px"))).toMap
    assert(got(("A", 25L)).contains(2.0))  // 25-20=5 <= 6
    assert(got(("A", 99L)).isEmpty)        // 99-30=69 > 6
  }

  test("forward direction: earliest right with ts >= left ts") {
    val got = AsOfJoin.asOf(trades, quotes, Seq("sym"), "ts", "ts",
      Seq(("px", "next_px")), direction = "forward")
      .collect().map(r => (r.getAs[String]("sym"), r.getAs[Long]("ts")) ->
        Option(r.getAs[Any]("next_px"))).toMap
    assert(got(("A", 5L)).contains(1.0))   // next quote @10
    assert(got(("A", 20L)).contains(2.0))  // equal ts included
    assert(got(("A", 25L)).contains(3.0))  // next quote @30
    assert(got(("A", 99L)).isEmpty)        // nothing after
    assert(got(("C", 50L)).isEmpty)
  }

  test("left columns are preserved") {
    val out = AsOfJoin.asOf(trades, quotes, Seq("sym"), "ts", "ts", Seq(("px", "last_px")))
    assert(out.columns.toSeq == Seq("sym", "ts", "qty", "last_px"))
    assert(out.count() == 6)
  }
}
