package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("z-order clusters BOTH columns: per-file spans shrink vs unclustered") {
    val d = "/root/testdata/sf0.01"
    val li = graft.Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))

    def avgSpans(df: org.apache.spark.sql.DataFrame, dir: java.nio.file.Path): (Double, Double) = {
      df.write.mode("overwrite").parquet(dir.toString)
      val spans = spark.read.parquet(dir.toString)
        .groupBy(input_file_name())
        .agg((max("l_orderkey") - min("l_orderkey")).as("so"),
          (max("l_partkey") - min("l_partkey")).as("sp"))
        .agg(avg("so"), avg("sp")).head()
      (spans.getDouble(0), spans.getDouble(1))
    }

    val base = java.nio.file.Files.createTempDirectory("graft-zorder")
    // unclustered baseline: same file count, random-ish layout
    val (uo, up) = avgSpans(li.repartition(8), base.resolve("plain"))
    val (zo, zp) = avgSpans(Layout.zorderBy(li, Seq("l_orderkey", "l_partkey"), 8),
      base.resolve("zorder"))

    assert(zo < uo * 0.7, s"orderkey spans not clustered: $zo vs $uo")
    assert(zp < up * 0.7, s"partkey spans not clustered: $zp vs $up")
    // layout change must not change content
    assert(spark.read.parquet(base.resolve("zorder").toString).count() == li.count())
  }
}
