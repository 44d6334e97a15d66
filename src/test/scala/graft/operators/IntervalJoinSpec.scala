package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class IntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def iv(rows: (Long, Long, Long)*) =
    rows.toDF("id", "s", "e")

  test("overlapPairs: overlaps found, disjoint pairs absent, each pair once") {
    // id1 [0,100], id2 [50,150] overlap [50,100]; id3 [200,300] disjoint;
    // id4 [90,250] overlaps 1, 2 AND 3
    val df = iv((1L, 0L, 100L), (2L, 50L, 150L), (3L, 200L, 300L),
      (4L, 90L, 250L))
    val out = IntervalJoin.overlapPairs(df, Seq("id"), "s", "e",
      bucketWidth = 64L)
      .collect().map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        (r.getAs[Long]("overlap_start"), r.getAs[Long]("overlap_end"))))
    assert(out.length == out.map(_._1).distinct.length, "pair emitted twice")
    val m = out.toMap
    assert(m.keySet == Set((1L, 2L), (1L, 4L), (2L, 4L), (3L, 4L)))
    assert(m((1L, 2L)) == (50L, 100L))
    assert(m((3L, 4L)) == (200L, 250L))
  }

  test("overlapPairs: long interval spanning many buckets still emits once") {
    val df = iv((1L, 0L, 10000L), (2L, 9990L, 10010L))
    val out = IntervalJoin.overlapPairs(df, Seq("id"), "s", "e",
      bucketWidth = 10L).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("overlap_us") == 10L)
  }

  test("overlapPairs: touching endpoints count as overlap (inclusive µs)") {
    val df = iv((1L, 0L, 100L), (2L, 100L, 200L))
    val out = IntervalJoin.overlapPairs(df, Seq("id"), "s", "e", 1000L)
      .collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("overlap_us") == 0L)
  }

  test("overlapPairs plans an equi-join, never a cartesian/theta product") {
    val df = iv((1L, 0L, 100L), (2L, 50L, 150L))
    val p = IntervalJoin.overlapPairs(df, Seq("id"), "s", "e", 64L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(600))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(600))
  }

  test("composite keys order pairs by struct comparison") {
    val df = Seq((1L, 1L, 0L, 100L), (1L, 2L, 50L, 150L), (2L, 1L, 60L, 70L))
      .toDF("u", "sid", "s", "e")
    val out = IntervalJoin.overlapPairs(df, Seq("u", "sid"), "s", "e", 64L)
      .collect().map(r => ((r.getAs[Long]("u_a"), r.getAs[Long]("sid_a")),
        (r.getAs[Long]("u_b"), r.getAs[Long]("sid_b")))).toSet
    assert(out == Set(((1L, 1L), (1L, 2L)), ((1L, 1L), (2L, 1L)),
      ((1L, 2L), (2L, 1L))))
  }
}
