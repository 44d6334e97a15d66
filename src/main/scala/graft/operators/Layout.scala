package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering: Z-order (Morton) multi-dimensional sort, the
  * lakehouse technique for making parquet min/max statistics selective on
  * SEVERAL filter columns at once. A plain sort clusters only its leading
  * column; interleaving the bits of range-normalized values clusters all
  * of them, so row-group/file skipping works for predicates on any
  * participating column.
  *
  * Cost: one stats agg + one range repartition + local sort — exactly the
  * cost of a normal global sort. Run it once per write on the sink side.
  */
object Layout {

  private val Bits = 16 // per-dimension resolution; 16 bits × ≤4 dims stays in a long

  /** Morton/Z value of the given numeric columns, each range-normalized to
    * [0, 2^16) using the provided (min, max) stats.
    */
  private def zValue(cols: Seq[Column], stats: Seq[(Double, Double)]): Column = {
    val scaled = cols.zip(stats).map { case (c, (lo, hi)) =>
      val span = if (hi > lo) hi - lo else 1.0
      least(greatest(
        ((c.cast("double") - lit(lo)) / lit(span) * lit((1 << Bits) - 1)).cast("long"),
        lit(0L)), lit(((1 << Bits) - 1).toLong))
    }
    val d = scaled.size
    val terms = for {
      (v, i) <- scaled.zipWithIndex
      b <- 0 until Bits
    } yield shiftleft(shiftrightunsigned(v, b).bitwiseAND(lit(1L)), b * d + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Re-layout `df` clustered by the Z-order of `cols`, into `numFiles`
    * range-partitioned output tasks (→ files, when written).
    */
  def zorderBy(df: DataFrame, cols: Seq[String], numFiles: Int): DataFrame = {
    // 16 bits × 3 dims = 48 bits: bit 63 must stay clear or the long's
    // sign flips the sort order; 4+ dims would also wrap shift counts
    require(cols.nonEmpty && cols.size * Bits < 64,
      s"zorderBy supports at most ${63 / Bits} columns at $Bits bits, got ${cols.size}")
    val aggCols = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val statRow = df.agg(aggCols.head, aggCols.tail: _*).head()
    // empty input (or every column all-null): nothing to cluster
    if (cols.indices.forall(i => statRow.isNullAt(2 * i))) return df
    val stats = cols.indices.map { i =>
      // an all-null column yields null stats → constant contribution
      if (statRow.isNullAt(2 * i)) (0.0, 1.0)
      else (statRow.getDouble(2 * i), statRow.getDouble(2 * i + 1))
    }
    df.withColumn("__z", zValue(cols.map(col), stats))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
