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
}
