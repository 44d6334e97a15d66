package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.SpaceSavingSketch.spaceSavingTopK

class SpaceSavingSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // zipf-ish skew: key i repeated ~ 2000/i times, plus a uniform tail
  private def skewed: Seq[Long] =
    (1L to 20L).flatMap(i => Seq.fill((2000 / i).toInt)(i)) ++
      (1000L until 3000L)

  private def sketchOf(data: Seq[Long], capacity: Int, parts: Int) =
    data.toDF("k").repartition(parts)
      .agg(spaceSavingTopK(col("k"), capacity).as("hh"))
      .select(explode(col("hh")).as("x"))
      .select("x.item", "x.est", "x.err")
      .as[(Long, Long, Long)].collect()

  test("guarantees hold under multi-partition merge: bounds + coverage") {
    val data = skewed
    val trueCounts = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = data.size.toLong
    for (parts <- Seq(1, 7, 32)) {
      val sk = sketchOf(data, 50, parts)
      assert(sk.length <= 50)
      val est = sk.map(t => t._1 -> ((t._2, t._3))).toMap
      // est >= true and est - err <= true for every tracked item
      est.foreach { case (item, (e, err)) =>
        val t = trueCounts.getOrElse(item, 0L)
        assert(e >= t, s"item $item: est $e < true $t (parts=$parts)")
        assert(e - err <= t, s"item $item: est-err ${e - err} > true $t (parts=$parts)")
      }
      // coverage: every key with true count > n/capacity is tracked
      trueCounts.filter(_._2 * 50 > n).keys.foreach { hot =>
        assert(est.contains(hot), s"guaranteed heavy hitter $hot missing (parts=$parts)")
      }
    }
  }

  test("single partition with no eviction pressure is exact") {
    val data = Seq(1L, 1L, 2L, 3L, 3L, 3L)
    val sk = sketchOf(data, 10, 1).map(t => t._1 -> ((t._2, t._3))).toMap
    assert(sk == Map(1L -> ((2L, 0L)), 2L -> ((1L, 0L)), 3L -> ((3L, 0L))))
  }

  test("string keys: bounds + coverage under multi-partition merge and eviction") {
    // same zipf-ish skew, keys carried as strings — the sketch must
    // report the string items themselves (no pre-hashing) and keep the
    // SpaceSaving guarantees through serialize/merge
    val data: Seq[String] =
      (1L to 20L).flatMap(i => Seq.fill((2000 / i).toInt)(s"key_$i")) ++
        (1000L until 3000L).map(i => s"tail_$i")
    val trueCounts = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = data.size.toLong
    for (parts <- Seq(1, 7, 32)) {
      val sk = data.toDF("k").repartition(parts)
        .agg(spaceSavingTopK(col("k"), 50).as("hh"))
        .select(explode(col("hh")).as("x"))
        .select("x.item", "x.est", "x.err")
        .as[(String, Long, Long)].collect()
      assert(sk.length <= 50)
      val est = sk.map(t => t._1 -> ((t._2, t._3))).toMap
      est.foreach { case (item, (e, err)) =>
        val t = trueCounts.getOrElse(item, 0L)
        assert(e >= t, s"item $item: est $e < true $t (parts=$parts)")
        assert(e - err <= t, s"item $item: est-err ${e - err} > true $t (parts=$parts)")
      }
      trueCounts.filter(_._2 * 50 > n).keys.foreach { hot =>
        assert(est.contains(hot), s"guaranteed heavy hitter $hot missing (parts=$parts)")
      }
    }
  }

  test("string keys without eviction pressure are exact") {
    val sk = Seq("a", "a", "b", "c", "c", "c").toDF("k")
      .agg(spaceSavingTopK(col("k"), 10).as("hh"))
      .select(explode(col("hh")).as("x"))
      .select("x.item", "x.est", "x.err")
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(sk == Map("a" -> ((2L, 0L)), "b" -> ((1L, 0L)), "c" -> ((3L, 0L))))
  }

  test("unsupported key type is rejected at analysis") {
    val df = Seq(Tuple1(1.5)).toDF("k")
    val e = intercept[Exception] {
      df.agg(spaceSavingTopK(col("k"), 5)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string") ||
      e.getMessage.toLowerCase.contains("type"), e.getMessage)
  }

  test("nulls ignored, capacity respected under heavy churn") {
    val df = (0L until 5000L).map(i => if (i % 10 == 0) None else Some(i))
      .toDF("k").repartition(8)
    val sk = df.agg(spaceSavingTopK(col("k"), 5).as("hh"))
      .select(size(col("hh"))).as[Int].collect().head
    assert(sk <= 5 && sk > 0)
  }

  test("heap-evicted sketch keeps the guarantees on an eviction-heavy stream") {
    // cardinality ≫ capacity with planted heavies: every miss evicts,
    // exercising the lazy-deletion heap + compaction + post-merge
    // rebuild paths; N/capacity coverage and est≥true must still hold
    val heavies = (0L until 5L).flatMap(h => Seq.fill(400)(h))
    val tail = (100L until 4000L)
    val df = (heavies ++ tail).toDF("k").repartition(7)
    val got = df.agg(spaceSavingTopK(col("k"), 64).as("hh"))
      .select(explode(col("hh")).as("x"))
      .select("x.item", "x.est", "x.err")
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    val n = heavies.size + tail.size
    (0L until 5L).foreach { h =>
      assert(got.contains(h), s"guaranteed heavy $h missing") // 400 > N/64
      val (est, err) = got(h)
      assert(est >= 400L && est - err <= 400L, s"$h: est=$est err=$err")
    }
    assert(got.size <= 64)
    assert(n / 64 < 400) // the coverage premise of the assertions above
  }
}
