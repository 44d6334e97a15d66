package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zOrder2: known interleavings") {
    // x=0b11, y=0b00 -> bits at 0 and 2 -> 5; x=0, y=0b11 -> bits 1,3 -> 10
    // x=0b10, y=0b01 -> x bit1 at pos2, y bit0 at pos1 -> 4+2 = 6
    val out = Seq((3L, 0L), (0L, 3L), (2L, 1L), (255L, 255L))
      .toDF("x", "y")
      .select(ZOrder.zOrder2(col("x"), col("y"), 8).as("z"))
      .as[Long].collect().toSeq
    assert(out == Seq(5L, 10L, 6L, 65535L))
  }

  test("skippingAudit: z-order shrinks the non-sort dimension's file span") {
    // 64x64 grid, one row per cell: linear-x files cover every y (span
    // 63); z-order files cover an 8x... rectangle (spans well under 63)
    val grid = (for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val out = ZOrder.skippingAudit(grid, col("x"), col("y"),
      rowsPerFile = 256, bits = 6)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val (lf, lx, ly) = out("linear_x")
    val (zf, zx, zy) = out("zorder")
    assert(lf == 16L && zf == 16L)
    assert(ly == 63.0, s"linear files must span all of y, got $ly")
    assert(lx <= 4.0, s"linear x span should be tight, got $lx")
    // a 256-row z-order file covers a 16x16 tile of a 64x64 grid
    assert(zx == 15.0 && zy == 15.0, s"z tiles should be 16x16, got $zx x $zy")
  }
}
