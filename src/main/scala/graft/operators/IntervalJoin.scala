package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap self-join via time-bucket blocking — the scale-safe
  * form of `a.start <= b.end AND b.start <= a.end`. A naive theta join
  * is a cartesian product (every pair compared); blocking explodes each
  * interval into the fixed-width buckets it covers and equi-joins on the
  * bucket, so Spark plans a plain shuffled hash/sort-merge join and only
  * bucket-cohabiting intervals are ever compared. Each overlapping pair
  * is emitted EXACTLY once — only from the first bucket the overlap
  * region itself covers (`bucket == floor(max(starts) / width)`), the
  * standard dedup-free blocking trick (no `distinct` pass needed).
  *
  * Bucket width tunes the block size: too small explodes long intervals
  * into many rows; too wide degrades toward all-pairs within a bucket.
  * At 100 TB pick width ≈ the median interval span so each interval
  * covers O(1) buckets.
  */
object IntervalJoin {

  /** All distinct overlapping pairs among `intervals`, ordered pairs by
    * the struct of `idCols` (left < right — each unordered pair once,
    * self-pairs excluded). Start/end are inclusive long micros (the q47
    * µs convention). Output: left/right ids, overlap_start, overlap_end,
    * overlap_us.
    */
  def overlapPairs(intervals: DataFrame, idCols: Seq[String],
      startCol: String, endCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val exploded = intervals.select(
      struct(idCols.map(col): _*).as("key"),
      col(startCol).as("s"), col(endCol).as("e"))
      .filter(col("s") <= col("e"))
      // integral div, not floor(double /): µs epochs near 2^53 would be
      // one-ulp-from-boundary fragile under double division
      .select(col("key"), col("s"), col("e"),
        explode(sequence(expr(s"s div ${bucketWidth}L"),
          expr(s"e div ${bucketWidth}L"))).as("bucket"))
    val a = exploded.select(col("bucket"), col("key").as("key_a"),
      col("s").as("s_a"), col("e").as("e_a"))
    val b = exploded.select(col("bucket"), col("key").as("key_b"),
      col("s").as("s_b"), col("e").as("e_b"))
    a.join(b, Seq("bucket"))
      .filter(col("key_a") < col("key_b"))
      .filter(col("s_a") <= col("e_b") && col("s_b") <= col("e_a"))
      // first-overlap-bucket guard: count each pair exactly once
      .filter(col("bucket") ===
        expr(s"greatest(s_a, s_b) div ${bucketWidth}L"))
      .select(
        (idCols.map(c => col(s"key_a.$c").as(s"${c}_a")) ++
          idCols.map(c => col(s"key_b.$c").as(s"${c}_b")) ++ Seq(
            greatest(col("s_a"), col("s_b")).as("overlap_start"),
            least(col("e_a"), col("e_b")).as("overlap_end"),
            (least(col("e_a"), col("e_b")) -
              greatest(col("s_a"), col("s_b"))).as("overlap_us"))): _*)
  }
}
