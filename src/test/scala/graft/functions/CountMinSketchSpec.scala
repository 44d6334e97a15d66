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
}
