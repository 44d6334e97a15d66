package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("profile: one row per column, exact stats, nulls counted") {
    val df = Seq(
      (1L, Some("aa"), Some(10)),
      (2L, None, Some(20)),
      (3L, Some("b"), None),
      (4L, Some("aa"), Some(20))).toDF("id", "s", "v")
    val p = Profile.profile(df, Seq("id", "s", "v")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("id", "s", "v"))
    val s = p("s")
    assert(s.getLong(1) == 4 && s.getLong(2) == 1) // n_rows, n_nulls
    assert(s.getLong(3) == 2) // distinct non-null: aa, b
    assert(s.getString(4) == "aa" && s.getString(5) == "b")
    assert(s.getLong(6) == 5) // 2 + 1 + 2 rendered chars
    val v = p("v")
    assert(v.getLong(3) == 2 && v.getString(4) == "10" && v.getString(5) == "20")
  }

  test("profile: approxDistinct plans without Expand and stays near exact") {
    val df = (0L until 5000L).map(i => (i, i % 97)).toDF("id", "k")
    val approx = Profile.profile(df, Seq("id", "k"), approxDistinct = true)
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx profile must not Expand:\n$plan")
    val exact = Profile.profile(df, Seq("id", "k"))
    assert(exact.queryExecution.executedPlan.toString.contains("Expand"))
    val byCol = approx.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(math.abs(byCol("k") - 97.0) / 97.0 < 0.1)
    assert(math.abs(byCol("id") - 5000.0) / 5000.0 < 0.1)
  }

  test("profile: hostile column names (quotes, commas, dots, backticks, spaces)") {
    val hostile = Seq("it's, tricky", "a.b c", "back`tick", "stack(2")
    var df = Seq((1L, "x", "y", "z", "w"), (2L, "x", null, "z", "q"))
      .toDF("id", "c1", "c2", "c3", "c4")
    hostile.zipWithIndex.foreach { case (h, i) =>
      df = df.withColumnRenamed(s"c${i + 1}", h)
    }
    val p = Profile.profile(df, hostile).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet == hostile.toSet)
    assert(p("it's, tricky").getLong(3) == 1)      // ndv of constant col
    assert(p("a.b c").getLong(2) == 1)             // one null
    assert(p("stack(2").getLong(3) == 2)           // w, q
  }

  test("profile: all-null column yields empty min/max and zero sum_len") {
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "s")
    val r = Profile.profile(df, Seq("s")).collect().head
    assert(r.getLong(2) == 2 && r.getLong(3) == 0)
    assert(r.isNullAt(4) && r.isNullAt(5) && r.getLong(6) == 0)
  }

  test("fdAudit: majority pick, violation counts, and the rhs tie-break") {
    val df = Seq(("x", "p"), ("x", "p"), ("x", "p"), ("x", "q"),
      ("y", "r"), ("y", "r"),
      ("z", "p"), ("z", "a")).toDF("lhs", "rhs")
    val out = Profile.fdAudit(df, "lhs", "rhs")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("x").getAs[Long]("n_rows") == 4L)
    assert(out("x").getAs[Long]("n_rhs") == 2L)
    assert(out("x").getAs[String]("majority_rhs") == "p")
    assert(out("x").getAs[Long]("n_violations") == 1L)
    assert(out("x").getAs[Double]("violation_rate") == 0.25)
    // a clean dependency: zero violations
    assert(out("y").getAs[Long]("n_rhs") == 1L &&
      out("y").getAs[Long]("n_violations") == 0L)
    // equal counts: majority is the ASCII-smaller rhs
    assert(out("z").getAs[String]("majority_rhs") == "a")
  }
}
