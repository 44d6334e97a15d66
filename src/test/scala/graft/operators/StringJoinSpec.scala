package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StringJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("editDistancePairs: finds within-k pairs, rejects beyond-k") {
    val df = Seq("kitten", "sitten", "sittin", "mittens", "unrelated")
      .toDF("s")
    val out = StringJoin.editDistancePairs(df, "s", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2))
      .toMap
    assert(out(("kitten", "sitten")) == 1)
    assert(out(("sitten", "sittin")) == 1)
    assert(out(("kitten", "sittin")) == 2)
    assert(out(("mittens", "sitten")) == 2)
    assert(!out.keys.exists(p => p._1 == "unrelated" || p._2 == "unrelated"))
  }

  test("editDistancePairs: repeated-gram strings survive (multiset bound)") {
    // distinct-gram counting would see one "aa" gram and prune wrongly
    val df = Seq("aaaaaaaa", "aaaaaaab", "bbbbbbbb").toDF("s")
    val out = StringJoin.editDistancePairs(df, "s", maxDist = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("aaaaaaaa", "aaaaaaab")))
  }

  test("editDistancePairs: short strings route through the short band") {
    // len <= q(k+1)-1 = 5 at k=2,q=2: the count bound can't prune these
    val df = Seq("ab", "ba", "abcd", "zz").toDF("s")
    val out = StringJoin.editDistancePairs(df, "s", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out.contains(("ab", "ba")))   // dist 2, shares NO ordered grams
    assert(out.contains(("ab", "zz")))   // dist 2 substitutions
    assert(out.contains(("ab", "abcd"))) // dist 2 inserts, length band edge
    assert(!out.contains(("abcd", "zz")))// dist 4
  }

  test("editDistancePairs: duplicates collapse before pairing") {
    val df = Seq("same", "same", "samey").toDF("s")
    val out = StringJoin.editDistancePairs(df, "s", maxDist = 1).collect()
    assert(out.length == 1)
  }
}
