package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ClusterQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Two well-separated 2-D clusters with hand-computable geometry:
  //   A = {(0,0), (0,2)} -> centroid (0,1), every point at distance 1
  //   B = {(10,0), (10,2)} -> centroid (10,1), same shape shifted +10
  private def twoClusters = Seq(
    (0L, Array(0f, 0f), "A"), (1L, Array(0f, 2f), "A"),
    (2L, Array(10f, 0f), "B"), (3L, Array(10f, 2f), "B")
  ).toDF("vec_id", "embedding", "label")

  test("simplifiedSilhouette: hand-computed two-cluster geometry") {
    // a = 1, b = sqrt(101) for every point by symmetry:
    // s = (b - a)/b = 1 - 1/sqrt(101) = 0.900496..., mean rounds 0.9005
    val r = ClusterQuality.simplifiedSilhouette(twoClusters)
      .collect().map(x => x.getAs[String]("label") ->
        ((x.getAs[Long]("n"), x.getAs[Double]("mean_silhouette")))).toMap
    assert(r("A") == ((2L, 0.9005)))
    assert(r("B") == ((2L, 0.9005)))
  }

  test("simplifiedSilhouette: point on coincident centroids scores 0") {
    // Both labels centroid at the origin; a = b = 0 -> s = 0 by contract
    val df = Seq(
      (0L, Array(0f, 0f), "A"),
      (1L, Array(0f, 0f), "B")
    ).toDF("vec_id", "embedding", "label")
    val r = ClusterQuality.simplifiedSilhouette(df).collect()
    assert(r.forall(_.getAs[Double]("mean_silhouette") == 0.0))
  }

  test("daviesBouldin: hand-computed scatter and ratio") {
    // S_A = S_B = 1 (every point 1 away from its centroid),
    // M_AB = 10 -> ratio (1 + 1)/10 = 0.2 for both labels
    val r = ClusterQuality.daviesBouldin(twoClusters)
      .collect().map(x => x.getAs[String]("label") ->
        ((x.getAs[Long]("n"), x.getAs[Double]("scatter"),
          x.getAs[Double]("db_ratio")))).toMap
    assert(r("A") == ((2L, 1.0, 0.2)))
    assert(r("B") == ((2L, 1.0, 0.2)))
  }

  test("daviesBouldin: coincident centroids yield NULL ratio, not Inf") {
    val df = Seq(
      (0L, Array(1f, 0f), "A"), (1L, Array(-1f, 0f), "A"),
      (2L, Array(0f, 1f), "B"), (3L, Array(0f, -1f), "B")
    ).toDF("vec_id", "embedding", "label") // both centroids = origin
    val r = ClusterQuality.daviesBouldin(df).collect()
    assert(r.length == 2)
    assert(r.forall(x => x.isNullAt(x.fieldIndex("db_ratio"))))
    assert(r.forall(_.getAs[Double]("scatter") == 1.0))
  }

  test("silhouette improves when clusters separate") {
    val near = Seq(
      (0L, Array(0f, 0f), "A"), (1L, Array(0f, 2f), "A"),
      (2L, Array(1f, 0f), "B"), (3L, Array(1f, 2f), "B")
    ).toDF("vec_id", "embedding", "label")
    def mean(df: org.apache.spark.sql.DataFrame): Double =
      ClusterQuality.simplifiedSilhouette(df)
        .collect().map(_.getAs[Double]("mean_silhouette")).sum / 2
    assert(mean(near) < mean(twoClusters))
  }
}
