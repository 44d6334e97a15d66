package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rrf: hand-computed fusion of two lists, absent items contribute 0") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    val got = Retrieval.rrf(Seq(a, b), "id", "rank", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // fused: 20 → 1/62+1/61, 10 → 1/61, 40 → 1/62, 30 → 1/63
    val expect = Seq(
      (20L, 2L, 1.0 / 62 + 1.0 / 61),
      (10L, 1L, 1.0 / 61),
      (40L, 1L, 1.0 / 62),
      (30L, 1L, 1.0 / 63))
    assert(got.toSeq == expect) // bit-exact doubles, rank order included
  }

  test("rrf: k cuts the fused list; id breaks exact ties") {
    // two lists ranking disjoint ids identically → tied scores, id order
    val a = Seq((5L, 1), (6L, 2)).toDF("id", "rank")
    val b = Seq((9L, 1), (2L, 2)).toDF("id", "rank")
    val got = Retrieval.rrf(Seq(a, b), "id", "rank", k = 3)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(5L, 9L, 2L)) // 1/61 ties → id asc; then 1/62 pair cut at k
  }

  test("rankBiasedOverlap: identical lists 1.0; disjoint 0.0; closed form for a known case") {
    def ranking(g: Long, ids: Seq[Long]) =
      ids.zipWithIndex.map { case (id, i) => (g, id, i + 1) }
    val a = (ranking(1L, Seq(10, 20, 30)) ++ ranking(2L, Seq(10, 20, 30)) ++
      ranking(3L, Seq(10, 20, 30))).toDF("g", "id", "rank")
    val b = (ranking(1L, Seq(10, 20, 30)) ++ ranking(2L, Seq(40, 50, 60)) ++
      ranking(3L, Seq(20, 10, 30))).toDF("g", "id", "rank")
    val out = Retrieval.rankBiasedOverlap(a, b, "g", "id", "rank", p = 0.5, k = 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("rbo")).toMap
    // identical prefix at every depth → RBO = (1-p)Σp^{d-1} = 1-p^k = 0.875
    assert(out(1L) == 0.875)
    assert(out(2L) == 0.0)
    // swapped top-2: overlaps 0/1, 2/2, 3/3 → 0.5·(0 + 0.5·1 + 0.25·1)
    assert(out(3L) == 0.375)
  }

  test("ndcgAtK: perfect ranking 1.0; relevant-last discounts; zero-relevant null") {
    // group 1: rel at ranks 1,2 of 2 total → perfect; group 2: rel at
    // rank 3 of 1 total → dcg = 1/log2(4), idcg = 1; group 3: none
    val ranked = Seq(
      (1L, 1, 1.0), (1L, 2, 1.0), (1L, 3, 0.0),
      (2L, 1, 0.0), (2L, 2, 0.0), (2L, 3, 1.0),
      (3L, 1, 0.0), (3L, 2, 0.0)).toDF("g", "rank", "rel")
    val totals = Seq((1L, 2L), (2L, 1L), (3L, 0L)).toDF("g", "n")
    val out = Retrieval.ndcgAtK(ranked, "g", "rank", "rel", totals, "n", k = 3)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getAs[Double]("ndcg")))).toMap
    assert(out(1L).contains(1.0))
    val expected2 = math.rint(1.0 / (math.log(4.0) / math.log(2.0)) * 10000) / 10000
    assert(out(2L).contains(expected2))
    assert(out(3L).isEmpty)
  }

  test("ndcgAtKGraded: graded perfect 1.0, graded gain cannot exceed 1, zero-gain null") {
    // g1: perfect graded ranking (3,2,1 in gain order) → exactly 1.0
    // g2: single gain-2 item found at rank 2 — the binary normalizer
    //     would score 2/log2(3) / 1 = 1.26 (>1, the round-8 defect);
    //     the graded ideal (2/log2(2)) keeps it at 0.6309
    // g3: relevant nothing → NULL
    val ranked = Seq(
      (1L, 1, 3.0), (1L, 2, 2.0), (1L, 3, 1.0),
      (2L, 1, 0.0), (2L, 2, 2.0),
      (3L, 1, 0.0)).toDF("g", "rank", "rel")
    val gains = Seq(
      (1L, 3.0), (1L, 2.0), (1L, 1.0),
      (2L, 2.0)).toDF("g", "gain")
    val out = Retrieval.ndcgAtKGraded(ranked, "g", "rank", "rel",
        gains, "gain", k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    assert(out(1L) == ((3L, Some(1.0))))
    val dcg2 = 2.0 / (math.log(3.0) / math.log(2.0))
    val exp2 = math.rint(dcg2 / 2.0 * 10000) / 10000
    assert(out(2L) == ((1L, Some(exp2))) && exp2 < 1.0)
    assert(out(3L) == ((0L, None)))
  }

  test("reciprocalRank: first-hit rank, no-hit 0.0, beyond-k hit ignored") {
    val ranked = Seq(
      (1L, 1, 1.0), (1L, 2, 1.0),           // hit at rank 1 → 1.0
      (2L, 1, 0.0), (2L, 2, 0.0), (2L, 3, 1.0), // first hit rank 3
      (3L, 1, 0.0), (3L, 2, 0.0),           // nothing → 0.0
      (4L, 4, 1.0)).toDF("g", "rank", "rel") // hit beyond k=3 → 0.0
    val out = Retrieval.reciprocalRank(ranked, "g", "rank", "rel", k = 3)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getDouble(2))))
      .toMap
    assert(out(1L) == ((Some(1L), 1.0)))
    assert(out(2L) == ((Some(3L), 0.3333)))
    assert(out(3L) == ((None, 0.0)))
    assert(out(4L) == ((None, 0.0)))
  }

  test("coverageNovelty: hand-computed coverage, novelty and collapse") {
    // u1→{a,b}, u2→{a,c}: item a shown to all users → novelty 0;
    // b/c each −log₂(1/2) = 1 → novelty (0·2 + 1 + 1)/4 = 0.5
    val recs = Seq(("u1", "a"), ("u1", "b"), ("u2", "a"), ("u2", "c"))
      .toDF("user", "item")
    val r = Retrieval.coverageNovelty(recs, "user", "item",
      catalogSize = 10L).collect().head
    assert(r.getAs[Long]("n_users") == 2L)
    assert(r.getAs[Long]("catalog_size") == 10L)
    assert(r.getAs[Long]("n_distinct_recommended") == 3L)
    assert(r.getAs[Double]("coverage") == 0.3)
    assert(r.getAs[Double]("novelty") == 0.5)
    assert(r.getAs[Double]("max_item_share") == 1.0)
  }
}
