package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AssociationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("frequentPairs: counts, support, confidence, lift on a hand basket set") {
    // baskets: {milk,bread}, {milk,bread,eggs}, {milk,eggs}, {bread}
    val df = Seq((1L, "milk"), (1L, "bread"), (2L, "milk"), (2L, "bread"),
      (2L, "eggs"), (3L, "milk"), (3L, "eggs"), (4L, "bread"))
      .toDF("basket", "item")
    val out = Association.frequentPairs(df, "basket", "item", minSupport = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // (bread, milk): together in 2 of 4 baskets; bread in 3, milk in 3
    val bm = out(("bread", "milk"))
    assert(bm.getAs[Long]("pair_count") == 2)
    assert(bm.getAs[Double]("support") == 0.5)
    assert(bm.getAs[Double]("confidence_1_2") == 2.0 / 3)
    assert(bm.getAs[Double]("lift") == (2.0 / 3) / (3.0 / 4))
    // (eggs, milk) with support 2 present; nothing else reaches 2
    assert(out.keySet == Set(("bread", "milk"), ("eggs", "milk")))
  }

  test("frequentPairs: a-priori — below-support items never pair") {
    val df = Seq((1L, "a"), (1L, "rare"), (2L, "a"), (2L, "b"), (3L, "a"),
      (3L, "b")).toDF("basket", "item")
    val out = Association.frequentPairs(df, "basket", "item", minSupport = 2)
      .collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("a", "b")))
  }

  test("frequentPairs: duplicate items within a basket count once") {
    val df = Seq((1L, "x"), (1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"))
      .toDF("basket", "item")
    val out = Association.frequentPairs(df, "basket", "item", minSupport = 2)
      .collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("pair_count") == 2)
  }

  test("frequentTriples: only triples meeting support survive") {
    // {a,b,c} together in baskets 1,2; {a,b,d} only in basket 3
    val df = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"), (2L, "c"),
      (3L, "a"), (3L, "b"), (3L, "d"))
      .toDF("basket", "item")
    val out = Association.frequentTriples(df, "basket", "item",
      minSupport = 2L).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getString(0), r.getString(1), r.getString(2)) == ("a", "b", "c"))
    assert(r.getAs[Long]("triple_count") == 2L)
    assert(r.getAs[Double]("support") == 2.0 / 3.0)
  }

  test("frequentTriples: plan construction runs a bounded action count") {
    // the shared level-1 frame means building the triple plan runs a
    // FIXED set of construction executions — never one count per
    // a-priori level. With the leak-free lazy localCheckpoint (r8:
    // persist pinned CacheManager entries for the session), AQE
    // materializes each checkpoint's shuffle stages inside
    // localCheckpoint()'s own execution, so construction is exactly 3
    // executions: items stage-materialization, the basket count, and
    // frequent stage-materialization — each level-1 shuffle runs ONCE
    // no matter how many plan branches the higher levels fan out of it.
    val df = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"), (2L, "c"))
      .toDF("basket", "item")
    // AQE fans one action out into several jobs, so count distinct SQL
    // EXECUTIONS (each eager DataFrame action is exactly one)
    val execIds = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
          .foreach(id => execIds.add(id): Unit)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val plan = Association.frequentTriples(df, "basket", "item", 2L)
      // listener events are async but ordered: run a marker action and
      // wait for its execution id — every construction-time job start
      // is then recorded too
      spark.range(1).count()
      val deadline = System.nanoTime() + 10_000_000_000L
      while (execIds.size < 4 && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(execIds.size == 4, // 3 construction (see header) + marker
        s"plan construction ran ${execIds.size - 1} actions, expected 3")
      assert(plan.collect().length == 1)
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
