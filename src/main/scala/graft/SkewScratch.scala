package graft

import org.apache.spark.sql.functions._

/** Dev measurement: salted vs plain join/agg on a DELIBERATELY skewed
  * key (hot key 0 owns ~30% of events — the q292 derivation) at the
  * given SF dir. Run with AQE skew-join on and off to see all four
  * remedies. Usage: runMain graft.SkewScratch [sfDir]
  */
object SkewScratch {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/localdata/sf1")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[skew] $name: $s%.2f s"); s
    }
    // second arg = synthetic row count (0 → use the events table). The
    // events lane proves answer-invariance at q292's derivation; the
    // synthetic lane is sized so the hot key's partition actually
    // straggles (30% of N rows on one key vs N/cores per uniform task).
    val synthRows = args.drop(1).headOption.map(_.toLong).getOrElse(0L)
    val fact =
      if (synthRows > 0)
        spark.range(synthRows).select(
          when(col("id") % 10 < 3, lit(0L))
            .otherwise(pmod(xxhash64(col("id")), lit(100000L)) + 1L).as("k"),
          (col("id") % 1000).cast("double").as("value"))
      else Tables.events(spark, d).select(
        when(col("event_id") % 10 < 3, lit(0L))
          .otherwise(col("user_id") + 1L).as("k"),
        col("value"))
    val dim = fact.select(col("k")).distinct()
      .withColumn("band", col("k") % lit(7L))
      .localCheckpoint(true) // materialize so dim build isn't re-timed
    def plain() = fact.join(dim, Seq("k"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)")))
    def salted() = graft.operators.SkewJoin
      .saltedEquiJoin(fact, dim, "k", saltFactor = 16)
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)")))
    def run(df: => org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warmups
    run(plain()); run(salted())
    for (aqeSkew <- Seq(true, false)) {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqeSkew)
      // force shuffle joins: broadcast would hide the skew entirely
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", -1)
      for (p <- 1 to 3) {
        time(s"plain  aqeSkew=$aqeSkew pass$p")(run(plain()))
        time(s"salted aqeSkew=$aqeSkew pass$p")(run(salted()))
      }
    }
    // sanity: same answer
    val a = plain().collect().map(_.toString).sorted.mkString("|")
    val b = salted().collect().map(_.toString).sorted.mkString("|")
    println(s"[skew] plain == salted: ${a == b}")
    spark.stop()
  }
}
