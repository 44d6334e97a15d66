package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class OutliersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("groupMedian: odd and even group sizes, exact values") {
    val df = Seq(
      ("a", 1.0), ("a", 9.0), ("a", 5.0), // odd: median 5
      ("b", 2.0), ("b", 4.0), ("b", 10.0), ("b", 20.0)) // even: (4+10)/2
      .toDF("g", "v")
    val med = Outliers.groupMedian(df, "g", "v", "med")
      .as[(String, Double)].collect().toMap
    assert(med == Map("a" -> 5.0, "b" -> 7.0))
  }

  test("robustOutliers: a wild spike is flagged, the bulk is not") {
    val vals = (1 to 99).map(_.toDouble) :+ 1e9
    val df = vals.map(("g", _)).toDF("g", "v")
    val out = Outliers.robustOutliers(df, "g", "v", 3.5)
      .select("v", "is_outlier").as[(Double, Boolean)].collect().toMap
    assert(out(1e9))
    assert((40 to 60).forall(i => !out(i.toDouble)))
  }

  test("robustOutliers: MAD immune to the outlier it hunts (vs stddev)") {
    // with mean/stddev a single 1e9 inflates sigma so much nothing flags;
    // median/MAD still flags it and keeps the bulk clean
    val df = ((1 to 50).map(_.toDouble) :+ 1e9).map(("g", _)).toDF("g", "v")
    val flagged = Outliers.robustOutliers(df, "g", "v")
      .filter("is_outlier").select("v").as[Double].collect()
    assert(flagged.toSeq == Seq(1e9))
  }

  test("groups are independent and nulls are ignored") {
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", None), ("b", Some(100.0)), ("b", Some(200.0)), ("b", Some(300.0)))
      .toDF("g", "v")
    val out = Outliers.robustOutliers(df, "g", "v")
      .select("g", "med").distinct().as[(String, Double)].collect().toMap
    assert(out == Map("a" -> 2.0, "b" -> 200.0))
  }

  test("groupQuantiles: nearest-rank convention, exact values") {
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "v")
    val r = Outliers.groupQuantiles(df, "g", "v", Seq(50, 95, 99, 100))
      .collect()(0)
    assert(r.getAs[Long]("n") == 100)
    assert(r.getAs[Double]("p50") == 50.0)   // ceil(50*100/100) = 50
    assert(r.getAs[Double]("p95") == 95.0)
    assert(r.getAs[Double]("p99") == 99.0)
    assert(r.getAs[Double]("p100") == 100.0)
  }

  test("groupQuantiles: rank math is integral (no 0.95*n ulp ceiling)") {
    // n=2000: 95*2000/100 = 1900 exactly; a double ceil(0.95*2000)
    // would land on 1901
    val df = (1 to 2000).map(i => ("g", i.toDouble)).toDF("g", "v")
    val r = Outliers.groupQuantiles(df, "g", "v", Seq(95)).collect()(0)
    assert(r.getAs[Double]("p95") == 1900.0)
  }

  test("groupQuantiles rejects out-of-range percents") {
    val df = Seq(("g", 1.0)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      Outliers.groupQuantiles(df, "g", "v", Seq(0))
    }
  }

  test("skyline2D: dominance semantics incl. ties and duplicates") {
    val df = Seq(
      (1.0, 5.0), (2.0, 3.0), (3.0, 3.0),  // (3,3) dominated by (2,3)
      (4.0, 1.0), (4.0, 1.0),              // duplicate pair: kept once
      (5.0, 0.5), (1.0, 5.0),              // dup of (1,5)
      (2.0, 6.0))                          // dominated by (1,5)? no: 1<2 but 5<6 yes -> dominated
      .toDF("x", "y")
    val out = Outliers.skyline2D(df, "x", "y")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(out == Set((1.0, 5.0), (2.0, 3.0), (4.0, 1.0), (5.0, 0.5)))
  }

  test("skyline2D: same-x column keeps only the lowest y") {
    val df = Seq((1.0, 1.0), (1.0, 2.0), (1.0, 3.0)).toDF("x", "y")
    val out = Outliers.skyline2D(df, "x", "y").collect()
    assert(out.length == 1 && out(0).getDouble(1) == 1.0)
  }

  test("rollingMad: spike flags, zero-MAD frame degrades to any-deviation") {
    import java.sql.Timestamp
    def t(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    // user 1 alternates 1,2 then spikes; user 2 is constant then deviates
    val df = (Seq((1L, 1L, 1.0), (1L, 2L, 2.0), (1L, 3L, 1.0), (1L, 4L, 2.0),
        (1L, 5L, 1.0), (1L, 6L, 2.0), (1L, 7L, 100.0)) ++
      Seq((2L, 8L, 5.0), (2L, 9L, 5.0), (2L, 10L, 5.0), (2L, 11L, 5.5)))
      .zipWithIndex.map { case ((u, id, v), i) => (u, id, t(i % 24), v) }
      .toDF("user_id", "event_id", "ts", "value")
    val out = Outliers.rollingMad(df, "user_id", "ts", "event_id", "value",
      window = 7, k = 3.0)
      .collect().map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Double]("med"), r.getAs[Double]("mad"),
          r.getAs[Boolean]("is_anomaly"))).toMap
    // event 7: frame sorted [1,1,1,2,2,2,100] → med 2, mad 1, |98| > 3
    assert(out(7L) == ((2.0, 1.0, true)))
    // event 6: frame [1,1,1,2,2,2] → med 1 (lower), mad 0 → dev 1 flags
    assert(out(6L)._2 == 0.0 && out(6L)._3)
    // user 2: constant frames never flag; the 5.5 deviates on mad 0
    assert(!out(9L)._3 && !out(10L)._3)
    assert(out(11L) == ((5.0, 0.0, true)))
  }

  test("weightedMedian: half-mass pick, weights change the answer") {
    val df = Seq(
      ("g", 1, 1L), ("g", 2, 1L), ("g", 3, 10L),  // mass at 3
      ("h", 1, 5L), ("h", 2, 5L))                  // tie -> lower value
      .toDF("g", "v", "w")
    val out = Outliers.weightedMedian(df, "g", "v",
        org.apache.spark.sql.functions.col("w"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("g").getAs[Int]("weighted_median") == 3)
    assert(out("g").getAs[Long]("total_weight") == 12L)
    // 2*cw >= W first reached at v=1 (2*5 >= 10)
    assert(out("h").getAs[Int]("weighted_median") == 1)
  }

  test("seasonalDeviation: flags the value that is odd for its bucket") {
    import java.sql.Timestamp
    // same weekday+hour across weeks: 10,10,10,70 → bucket mean 25;
    // the 70 deviates +45, each 10 by −15. A different-hour bucket of
    // all 70s deviates 0 and must not appear in the top-k.
    def at(week: Int, hourShift: Long, id: Long, v: Double) =
      (id, new Timestamp((week * 7L * 86400L + hourShift * 3600L) * 1000L), v)
    val df = (Seq(at(0, 0, 1, 10.0), at(1, 0, 2, 10.0), at(2, 0, 3, 10.0),
      at(3, 0, 4, 70.0)) ++
      Seq(at(0, 5, 5, 70.0), at(1, 5, 6, 70.0)))
      .toDF("event_id", "ts", "value")
    val out = Outliers.seasonalDeviation(df, "ts", "event_id", "value", k = 3)
      .collect()
    assert(out.head.getAs[Long]("event_id") == 4L)
    assert(out.head.getAs[Double]("deviation") == 45.0)
    assert(out.head.getAs[Double]("bucket_mean") == 25.0)
    // next come the −15s in id order (tie-break); the 70-bucket is absent
    assert(out(1).getAs[Double]("deviation") == -15.0)
    assert(out(1).getAs[Long]("event_id") == 1L)
  }

  test("keySkewAudit: skew factor is max over mean") {
    // keys: a×6, b×2, c×1, d×1 → n_keys=4, total=10, mean=2.5,
    // skew_factor = 6/2.5 = 2.4
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d"))
      .zipWithIndex.map { case (k, i) => (k, i) }.toDF("k", "x")
    val out = SkewJoin.keySkewAudit(df, "k", topK = 3).collect()
    assert(out.length == 3)
    assert(out.head.getAs[Int]("rank") == 1)
    assert(out.head.getAs[String]("k") == "a")
    assert(out.head.getAs[Long]("n_rows") == 6L)
    assert(out.head.getAs[Double]("share") == 0.6)
    assert(out.forall(_.getAs[Double]("skew_factor") == 2.4))
    // (count DESC, key) tie-break: c before d at equal counts
    assert(out(2).getAs[String]("k") == "c")
  }

  test("mahalanobisDiag: hand-computed distances, zero-var dim skipped") {
    // dim0: 0,4,2,2 → μ=2, σ²=2 | dim1: 10,10,10,14 → μ=11, σ²=3
    // dim2 constant → σ²=0, skipped. d²: v1 2.333333 (tie with v2,
    // id-break), v3 0.333333, v4 3.0
    val df = Seq(
      (1L, "A", Seq(0f, 10f, 5f)), (2L, "A", Seq(4f, 10f, 5f)),
      (3L, "A", Seq(2f, 10f, 5f)), (4L, "A", Seq(2f, 14f, 5f)),
      (5L, "A", Seq.empty[Float]) // excluded
    ).toDF("vec_id", "label", "embedding")
    val out = Outliers.mahalanobisDiag(df, "label", "vec_id", "embedding",
      topK = 3).collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[Long]("vec_id")).toSeq == Seq(4L, 1L, 2L))
    assert(out.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
    assert(out.head.getAs[Double]("maha_dist") == 1.7321) // √3
    assert(out(1).getAs[Double]("maha_dist") == 1.5275)   // √2.333333
  }
}
