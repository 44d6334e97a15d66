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

  test("native exec matches the union+window formulation (fixture)") {
    val composed = AsOfJoin.asOf(trades, quotes, Seq("sym"), "ts", "ts",
      Seq(("px", "last_px")))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> Option(r.getAs[Any]("last_px"))).toMap
    val native = AsOfJoin.asOfNative(trades, quotes, Seq("sym"), "ts", "ts",
      Seq(("px", "last_px")))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> Option(r.getAs[Any]("last_px"))).toMap
    assert(native == composed)
  }

  test("native exec matches union+window on real events data + tolerance") {
    val ev = graft.Tables.events(TestSpark.spark, "/root/testdata/sf0.001")
    val purchases = ev.filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .select("user_id", "ts_ns", "value")
    val probes = ev.select("event_id", "user_id", "ts_ns")
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Any]("v"))).toMap
    val tol = Some(org.apache.spark.sql.functions.lit(86400L * 1000000000L)) // 1 day in ns
    val composed = collect(AsOfJoin.asOf(probes, purchases, Seq("user_id"),
      "ts_ns", "ts_ns", Seq(("value", "v")), tolerance = tol))
    val native = collect(AsOfJoin.asOfNative(probes, purchases, Seq("user_id"),
      "ts_ns", "ts_ns", Seq(("value", "v")), tolerance = tol))
    assert(native.size == 1000 && native == composed)
  }

  test("native exec plan contains the custom operator and no window/union") {
    val out = AsOfJoin.asOfNative(trades, quotes, Seq("sym"), "ts", "ts",
      Seq(("px", "last_px")))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(300))
    assert(!plan.contains("Window"), "native path should not use window exec")
    assert(!plan.contains("Union"), "native path should not union inputs")
  }

  test("native exec: null timestamps never match and never crash") {
    val q = Seq(("A", Option(10L), 1.0), ("A", Option.empty[Long], 99.0))
      .toDF("sym", "ts", "px")
    val t = Seq(("A", Option(15L), 100L), ("A", Option.empty[Long], 200L))
      .toDF("sym", "ts", "qty")
    val got = AsOfJoin.asOfNative(t, q, Seq("sym"), "ts", "ts", Seq(("px", "last_px")))
      .collect().map(r => Option(r.get(r.fieldIndex("ts"))) ->
        Option(r.getAs[Any]("last_px"))).toMap
    assert(got(Some(15L)).contains(1.0))  // matches the non-null quote only
    assert(got(None).isEmpty)             // null-ts probe: unmatched
    // the COMPOSED form agrees (pre-fix, the null-ts quote's payload
    // sorted NULLS FIRST and was carried into every row of the key)
    val composed = AsOfJoin.asOf(t, q, Seq("sym"), "ts", "ts",
      Seq(("px", "last_px")))
      .collect().map(r => Option(r.get(r.fieldIndex("ts"))) ->
        Option(r.getAs[Any]("last_px"))).toMap
    assert(composed == got)
  }

  test("native exec rejects mismatched ts/key types at planning, not silently") {
    val q = Seq(("A", 10, 1.0)).toDF("sym", "ts", "px") // INT ts
    val t = Seq(("A", 15L, 100L)).toDF("sym", "ts", "qty") // BIGINT ts
    val e = intercept[Exception] {
      AsOfJoin.asOfNative(t, q, Seq("sym"), "ts", "ts",
        Seq(("px", "last_px"))).collect()
    }
    assert(e.getMessage.contains("ts types differ"), e.getMessage)
  }

  test("left columns are preserved") {
    val out = AsOfJoin.asOf(trades, quotes, Seq("sym"), "ts", "ts", Seq(("px", "last_px")))
    assert(out.columns.toSeq == Seq("sym", "ts", "qty", "last_px"))
    assert(out.count() == 6)
  }
}
