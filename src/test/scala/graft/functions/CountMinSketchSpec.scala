package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.CountMinSketch.{cmsEstimate, cmsSketch}

class CountMinSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Depth = 4
  private val Width = 512

  private def sketchOf(data: Seq[Long], parts: Int): Array[Long] =
    data.toDF("k").repartition(parts)
      .agg(cmsSketch(col("k"), Depth, Width).as("sk"))
      .as[Array[Long]].head()

  private def estimates(data: Seq[Long], parts: Int): Map[Long, Long] = {
    val keys = data.distinct
    val sk = data.toDF("k").repartition(parts)
      .agg(cmsSketch(col("k"), Depth, Width).as("sk"))
    keys.toDF("k").crossJoin(broadcast(sk))
      .select(col("k"), cmsEstimate(col("sk"), col("k"), Depth, Width).as("est"))
      .as[(Long, Long)].collect().toMap
  }

  // zipf-ish skew plus a uniform tail
  private def skewed: Seq[Long] =
    (1L to 20L).flatMap(i => Seq.fill((500 / i).toInt)(i)) ++ (100L until 400L)

  test("linear sketch is bit-identical on any partitioning") {
    val data = skewed
    val one = sketchOf(data, 1)
    for (parts <- Seq(7, 32)) {
      assert(sketchOf(data, parts).sameElements(one), s"parts=$parts differs")
    }
    assert(one.sum == data.size.toLong * Depth, "each row sums to N")
  }

  test("never undercounts; within the e/width overcount bound here") {
    val data = skewed
    val trueCounts = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = math.E / Width * data.size
    estimates(data, 13).foreach { case (k, est) =>
      val t = trueCounts(k)
      assert(est >= t, s"key $k: est $est < true $t")
      assert(est <= t + bound, s"key $k: est $est > true $t + eps*N $bound")
    }
  }

  test("sketches of disjoint corpora sum to the sketch of their union") {
    val a = skewed.take(500)
    val b = skewed.drop(500)
    val sa = sketchOf(a, 3)
    val sb = sketchOf(b, 3)
    val union = sketchOf(a ++ b, 5)
    assert(sa.indices.forall(i => sa(i) + sb(i) == union(i)))
  }

  test("string and int keys; nulls skipped; unseen key estimates stay bounded") {
    val df = Seq(Some("a"), Some("a"), Some("b"), None)
      .toDF("k").repartition(2)
      .agg(cmsSketch(col("k"), Depth, Width).as("sk"))
    val est = df
      .select(
        cmsEstimate(col("sk"), lit("a"), Depth, Width).as("ea"),
        cmsEstimate(col("sk"), lit("b"), Depth, Width).as("eb"),
        cmsEstimate(col("sk"), lit("zzz"), Depth, Width).as("ez"))
      .as[(Long, Long, Long)].head()
    assert(est._1 == 2L && est._2 == 1L)
    assert(est._3 <= 2L) // collision with a or b at worst

    val ints = Seq(5, 5, 9).toDF("k")
      .agg(cmsSketch(col("k"), Depth, Width).as("sk"))
      .select(cmsEstimate(col("sk"), lit(5), Depth, Width))
      .as[Long].head()
    assert(ints == 2L)
  }

  test("cmsInnerProduct: exact on collision-free keys, never under with heavy overlap") {
    // A = {1:3, 2:1}, B = {1:2, 7:4} -> true join size = 3*2 = 6.
    // With width 2048 and 6 distinct cells, no row of any depth
    // collides here, so min-over-rows is EXACTLY 6.
    val a = Seq(1L, 1L, 1L, 2L).toDF("k")
      .agg(cmsSketch(col("k"), Depth, Width).as("ska"))
    val b = Seq(1L, 1L, 7L, 7L, 7L, 7L).toDF("k")
      .agg(cmsSketch(col("k"), Depth, Width).as("skb"))
    val est = a.crossJoin(b)
      .select(CountMinSketch.cmsInnerProduct(col("ska"), col("skb"),
        Depth, Width))
      .as[Double].head()
    assert(est == 6.0) // double-typed since the overflow-safe product
    // many shared heavy keys: estimate >= exact always
    val xs = (1L to 500L).flatMap(i => Seq.fill((i % 5).toInt + 1)(i % 40))
    val ya = xs.toDF("k").agg(cmsSketch(col("k"), Depth, Width).as("ska"))
    val yb = xs.reverse.toDF("k").agg(cmsSketch(col("k"), Depth, Width).as("skb"))
    val cnt = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val exact = cnt.values.map(c => c * c).sum
    val e2 = ya.crossJoin(yb)
      .select(CountMinSketch.cmsInnerProduct(col("ska"), col("skb"),
        Depth, Width))
      .as[Double].head()
    assert(e2 >= exact.toDouble)
    assert(e2 <= (exact + math.E / Width * xs.size * xs.size + 1))
  }
}
