package graft

/** Dev tool: dump formatted physical plans for key queries and grep-able
  * plan-quality markers (pushdown, pruning, join strategy, codegen).
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val d = "/root/testdata/sf0.1"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_pricing_summary", "q10_join_broadcast", "q11_join_multiway",
        "q14_window_topn", "q31_cosine_pairs", "q36_asof_join", "q09_wordcount")
    names.foreach { n =>
      println(s"\n########## $n ##########")
      SparkEntry.queries(n)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
