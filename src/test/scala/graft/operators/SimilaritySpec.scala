package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Orthonormal-ish toy vectors with known cosines
  private val vecs = Seq(
    (0L, Array(1f, 0f, 0f, 0f)),
    (1L, Array(0.9f, 0.1f, 0f, 0f)),   // close to 0
    (2L, Array(0f, 1f, 0f, 0f)),       // orthogonal to 0
    (3L, Array(-1f, 0f, 0f, 0f)),      // opposite of 0
    (4L, Array(0.7f, 0.7f, 0f, 0f))    // 45° to 0 and 2
  ).toDF("vec_id", "embedding")

  test("brute-force top-k ranks by cosine with deterministic tiebreak") {
    val got = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0L), k = 3)
      .collect().map(r => (r.getAs[Long]("corpus_id"), r.getAs[Int]("rank")))
    assert(got.sortBy(_._2).map(_._1).toSeq == Seq(1L, 4L, 2L))
  }

  test("threshold pairs: exact cosine values") {
    val got = Similarity.thresholdPairs(vecs, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 1L))) // cos(0,1)=0.9938...
  }

  test("cosine math: orthogonal=0, opposite=-1") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions._
    val r = vecs.filter($"vec_id" === 0L).crossJoin(
      vecs.filter($"vec_id" === 2L).select($"embedding".as("b")))
      .select(cosineSimilarity($"embedding", $"b")).head()
    assert(math.abs(r.getDouble(0)) < 1e-7)
    val r2 = vecs.filter($"vec_id" === 0L).crossJoin(
      vecs.filter($"vec_id" === 3L).select($"embedding".as("b")))
      .select(cosineSimilarity($"embedding", $"b")).head()
    assert(math.abs(r2.getDouble(0) + 1.0) < 1e-7)
  }

  test("LSH top-k recall vs brute force on real embeddings (sf0.001)") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probes = emb.filter($"vec_id" < 3)
    val exact = Similarity.bruteForceTopK(emb, probes, k = 5)
      .collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("corpus_id"))).toSet
    val approx = Similarity.lshTopK(emb, probes, k = 5, numPlanes = 6)
      .collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("corpus_id"))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"LSH recall too low: $recall") // multi-probe, 6 planes
  }

  test("banded LSH top-k: high recall where the single signature fails") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probes = emb.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(emb, probes, k = 10)
      .collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("corpus_id"))).toSet
    val banded = Similarity.bandedLshTopK(emb, probes, k = 10)
      .collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("corpus_id"))).toSet
    val recall = (exact intersect banded).size.toDouble / exact.size
    assert(recall >= 0.8, s"banded LSH recall too low: $recall") // measured 0.94
  }
}
