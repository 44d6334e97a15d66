package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class IvfAdcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Four well-separated cluster centers, vectors jittered around them. */
  private def corpus(n: Int, dim: Int = 16) = {
    (0 until n).map { i =>
      val c = i % 4
      (i.toLong, Array.tabulate(dim)(d =>
        (if (d / (dim / 4) == c) 10.0f else 0.0f) + (i % 5) * 0.01f))
    }.toDF("vec_id", "embedding")
  }

  test("encode carries the coarse cell and m codes per vector") {
    val df = corpus(40)
    val model = IvfAdc.train(df, kCells = 4, m = 4, pqK = 4,
      iterations = 2, dim = 16)
    val rows = IvfAdc.encode(df, model)
      .select("vec_id", "cell", "codes").collect()
    assert(rows.length == 40)
    assert(rows.forall(_.getSeq[Int](2).length == 4))
    // cluster-mates share a coarse cell
    val cellOf = rows.map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert((0 until 36 by 4).forall(i => cellOf(i.toLong) == cellOf(i.toLong + 4)))
  }

  test("topK returns same-cluster neighbors first") {
    val df = corpus(40)
    val model = IvfAdc.train(df, kCells = 4, m = 4, pqK = 4,
      iterations = 2, dim = 16)
    val codes = IvfAdc.encode(df, model)
    val top = IvfAdc.topK(codes, df.filter(col("vec_id") === 0), model,
      nprobe = 2, k = 5)
      .select("corpus_id", "rank").as[(Long, Int)].collect()
    assert(top.length == 5)
    assert(!top.map(_._1).contains(0L))
    assert(top.forall(_._1 % 4 == 0), top.mkString(","))  // cluster 0 only
  }

  test("residual PQ beats flat PQ on in-cell resolution (sanity)") {
    // residuals of a tight cluster have small magnitude; codes must
    // still separate the two in-cell subgroups we plant
    val df = (0 until 20).map { i =>
      val sub = i % 2
      (i.toLong, Array.tabulate(8)(d =>
        10.0f + (if (sub == 0) 0.5f else -0.5f) * (if (d < 4) 1 else 0)))
    }.toDF("vec_id", "embedding")
    val model = IvfAdc.train(df, kCells = 1, m = 2, pqK = 2,
      iterations = 2, dim = 8)
    val codes = IvfAdc.encode(df, model)
      .select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
    assert(codes(0L) == codes(2L))
    assert(codes(1L) == codes(3L))
    assert(codes(0L) != codes(1L))
  }

  test("codes never shuffle in topK (broadcast table join)") {
    val df = corpus(20)
    val model = IvfAdc.train(df, kCells = 2, m = 4, pqK = 2,
      iterations = 1, dim = 16)
    val codes = IvfAdc.encode(df, model)
    val p = IvfAdc.topK(codes, df.filter(col("vec_id") < 2), model,
      nprobe = 1, k = 3).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("persisted index: frozen-model append equals one-shot build") {
    val df = corpus(40)
    val even = df.filter(col("vec_id") % 2 === 0)
    val odd = df.filter(col("vec_id") % 2 =!= 0)
    val model = IvfAdc.train(even, kCells = 4, m = 4, pqK = 4,
      iterations = 2, dim = 16)
    val dir = java.nio.file.Files.createTempDirectory("ivfadc").toString
    IvfAdc.writeIndex(even, model, dir)
    IvfAdc.appendToIndex(odd, dir)
    val probes = df.filter(col("vec_id") < 2)
    val incr = IvfAdc.topKFromIndex(spark, dir, probes, nprobe = 2, k = 8)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    val oneShot = IvfAdc.topK(IvfAdc.encode(df, model), probes, model,
      nprobe = 2, k = 8)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    assert(incr == oneShot)
  }

  test("append to a withVectors index keeps the reranked path complete") {
    val df = corpus(40)
    val even = df.filter(col("vec_id") % 2 === 0)
    val odd = df.filter(col("vec_id") % 2 =!= 0)
    val model = IvfAdc.train(even, kCells = 4, m = 4, pqK = 4,
      iterations = 2, dim = 16)
    val dir = java.nio.file.Files.createTempDirectory("ivfadc-appv").toString
    IvfAdc.writeIndex(even, model, dir, withVectors = true)
    IvfAdc.appendToIndex(odd, dir)
    val probes = df.filter(col("vec_id") < 2)
    // pre-fix, appendToIndex never appended vectors/: appended ids
    // survived the ADC scan and then silently VANISHED in the exact
    // rerank's vectors join — the reranked result must equal the
    // in-memory rerank over the full corpus
    val persisted = IvfAdc.topKFromIndexReranked(spark, dir, probes,
      nprobe = 2, rerank = 12, k = 8)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    val mem = IvfAdc.topKReranked(IvfAdc.encode(df, model), df, probes,
      model, nprobe = 2, rerank = 12, k = 8)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    assert(persisted == mem)
    assert(persisted.values.exists(id => id % 2 == 1),
      "no appended (odd) vector ever surfaces in reranked results")
  }

  test("persisted probe prunes cell partitions at the scan") {
    val df = corpus(40)
    val model = IvfAdc.train(df, kCells = 4, m = 4, pqK = 4,
      iterations = 2, dim = 16)
    val dir = java.nio.file.Files.createTempDirectory("ivfadc2").toString
    IvfAdc.writeIndex(df, model, dir)
    val out = IvfAdc.topKFromIndex(spark, dir,
      df.filter(col("vec_id") === 0), nprobe = 1, k = 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell#") ||
      plan.contains("cell IN") || plan.contains("cell#"), plan.take(900))
    assert(out.collect().length == 3)
  }

  test("exact rerank fixes ADC quantization misranking") {
    val df = corpus(40)
    val model = IvfAdc.train(df, kCells = 4, m = 4, pqK = 4,
      iterations = 2, dim = 16)
    val codes = IvfAdc.encode(df, model)
    val probes = df.filter(col("vec_id") === 0)
    val rer = IvfAdc.topKReranked(codes, df, probes, model,
      nprobe = 2, rerank = 12, k = 5).collect()
    assert(rer.length == 5)
    // the rerank's ordering is the EXACT squared-L2 ordering over its
    // candidate set: distances are non-decreasing in rank and
    // re-computed here from the raw vectors
    val vecs = df.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val sorted = rer.sortBy(_.getInt(3))
    val dists = sorted.map(r => l2(vecs(0L), vecs(r.getLong(1))))
    assert(dists.zip(dists.tail).forall { case (a, b) => a <= b })
    assert(sorted.map(r => math.abs(r.getDouble(2) - l2(vecs(0L), vecs(r.getLong(1)))))
      .forall(_ < 1e-9))
  }

  test("persisted rerank equals in-memory rerank and prunes both scans") {
    val df = corpus(40)
    val model = IvfAdc.train(df, kCells = 4, m = 4, pqK = 4,
      iterations = 2, dim = 16)
    val dir = java.nio.file.Files.createTempDirectory("ivfadc3").toString
    IvfAdc.writeIndex(df, model, dir, withVectors = true)
    val probes = df.filter(col("vec_id") === 0)
    val persisted = IvfAdc.topKFromIndexReranked(spark, dir, probes,
      nprobe = 2, rerank = 12, k = 5)
    val mem = IvfAdc.topKReranked(IvfAdc.encode(df, model), df, probes, model,
      nprobe = 2, rerank = 12, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    assert(persisted.collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
      == mem)
    // the raw-vector fetch reads only probed cell directories: every
    // parquet scan in the plan carries a cell partition filter
    val plan = persisted.queryExecution.executedPlan.toString
    val scans = plan.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.nonEmpty)
    assert(plan.contains("PartitionFilters: [cell#") || plan.contains("cell IN"),
      plan.take(1200))
  }
}
