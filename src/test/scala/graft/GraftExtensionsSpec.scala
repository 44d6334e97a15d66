package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface smoke: every registered graft_* function callable from
  * spark.sql, plus the bucketed co-located join scale proof.
  */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = { val s = TestSpark.spark; GraftExtensions.register(s); s }

  test("custom expressions callable from SQL") {
    val r = spark.sql(
      """SELECT graft_clean_value('23,5 °F') AS cv,
        |  graft_fnv64('abc') AS f,
        |  graft_polyhash('ab') AS p,
        |  graft_simhash64(array('a','b')) AS sh,
        |  graft_minhash64(array('a','b'), 4) AS mh,
        |  graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
        |  graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS cos,
        |  graft_tokens('A b  C') AS toks,
        |  graft_quality_score('the quick brown fox is here today and it runs to the river bank with a dog in tow') AS q
        |""".stripMargin).head()
    assert(r.getDouble(0) == 23.5)
    assert(r.getLong(1) != 0L)
    assert(r.getLong(2) == (97L * 31 + 98) % 1000000007L)
    assert(r.getSeq[Long](4).length == 4)
    assert(r.getDouble(5) == 11.0)
    assert(math.abs(r.getDouble(6) - 1.0) < 1e-12)
    assert(r.getSeq[String](7) == Seq("a", "b", "c"))
    assert(r.getDouble(8) > 0.5)
  }

  test("custom aggregate callable from SQL (graft_bottomk)") {
    import spark.implicits._
    Seq("a", "b", "c", "a").toDF("v").createOrReplaceTempView("bk_in")
    val s = spark.sql("SELECT graft_bottomk(v, 8) AS s FROM bk_in").head()
      .getSeq[org.apache.spark.sql.Row](0)
    assert(s.map(_.getString(1)).toSet == Set("a", "b", "c"))
  }

  test("winnow and ngram-hash kernels callable from SQL") {
    val r = spark.sql(
      """SELECT graft_winnow('the winnowing algorithm fingerprint test string', 5, 4) AS w,
        |  graft_ngram_hashes('abcdef', 3) AS g""".stripMargin).head()
    assert(r.getSeq[Long](0).nonEmpty)
    assert(r.getSeq[Long](1).length == 4) // abc bcd cde def
  }

  test("SQL graft_clean_value matches the Column API over a table") {
    import spark.implicits._
    Seq("1,5 mph", "bad", "61 %").toDF("v").createOrReplaceTempView("cv_in")
    val viaSql = spark.sql("SELECT graft_clean_value(v) AS c FROM cv_in")
      .collect().map(r => Option(r.get(0))).toSeq
    assert(viaSql == Seq(Some(1.5), None, Some(61.0)))
  }

  test("bucketed tables join without a shuffle (co-located SMJ)") {
    val d = "/root/testdata/sf0.001"
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      Tables.orders(spark, d).write.mode("overwrite")
        .bucketBy(4, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
      Tables.customer(spark, d).write.mode("overwrite")
        .bucketBy(4, "c_custkey").sortBy("c_custkey").saveAsTable("b_customer")
      val joined = spark.table("b_orders").join(spark.table("b_customer"),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n${plan.take(800)}")
      assert(joined.count() == Tables.orders(spark, d).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
