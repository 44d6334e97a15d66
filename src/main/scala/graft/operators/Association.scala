package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-itemset primitives (market-basket association mining,
  * Agrawal & Srikant 1994): co-occurring item pairs with support,
  * confidence and lift — the OLAP-side companion of the recommendation
  * stack.
  */
object Association {

  /** Frequent item PAIRS with support ≥ `minSupport` baskets.
    *
    * Scale shape (the a-priori property doing the pruning):
    *   - distinct (basket, item) once;
    *   - items below `minSupport` are dropped BEFORE pairing (a pair
    *     can't be frequent if either member isn't — the a-priori
    *     downward-closure), which caps the per-basket self-join width;
    *   - the pair self-join is an EQUI-join on the basket key (shuffle
    *     co-partitioned), item-ordered (i1 < i2) so each pair counts
    *     once;
    *   - supports/confidences/lifts are fixed-order double quotients of
    *     exact counts (lift written as (cp/c1)/(c2/n) to avoid the
    *     cp·n product overflowing long at fleet scale).
    */
  def frequentPairs(baskets: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    val items = baskets.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .distinct()
    val nBaskets = items.select(col("b")).distinct().count()
    val itemCnt = items.groupBy(col("i")).agg(count(lit(1)).as("ci"))
      .filter(col("ci") >= minSupport)
    val frequent = items.join(itemCnt, Seq("i"))
    val pairs = frequent.select(col("b"), col("i").as("i1"), col("ci").as("c1"))
      .join(frequent.select(col("b"), col("i").as("i2"), col("ci").as("c2")),
        Seq("b"))
      .filter(col("i1") < col("i2"))
      .groupBy(col("i1"), col("i2"), col("c1"), col("c2"))
      .agg(count(lit(1)).as("pair_count"))
      .filter(col("pair_count") >= minSupport)
    pairs.select(col("i1"), col("i2"), col("pair_count"),
      (col("pair_count").cast("double") / nBaskets).as("support"),
      (col("pair_count").cast("double") / col("c1")).as("confidence_1_2"),
      ((col("pair_count").cast("double") / col("c1")) /
        (col("c2").cast("double") / nBaskets)).as("lift"))
  }
}
