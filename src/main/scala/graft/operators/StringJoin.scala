package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join with lossless q-gram count
  * filtering (Gravano et al. 2001, "Approximate String Joins in a
  * Database (Almost) for Free"): candidate pairs must share enough
  * q-gram occurrences — `|G(a) ⊓ G(b)| ≥ max(|a|,|b|) − q + 1 − k·q`
  * (one edit destroys at most q grams) — before the exact
  * `levenshtein ≤ k` verify. The naive form is an all-pairs theta join;
  * this one touches only gram-sharing pairs through an EQUI-join on the
  * gram.
  */
object StringJoin {

  /** All unordered pairs of distinct `strCol` values with
    * `levenshtein ≤ maxDist`. MULTISET gram semantics (per-string gram
    * counts, Σ min(ca, cb) across grams) — a distinct-gram count would
    * undercount repeated grams and break losslessness. Pairs where both
    * strings are too short for the bound to bite
    * (`len ≤ q·(k+1) − 1`) fall back to an all-pairs join within the
    * short band (a bounded population by construction).
    */
  def editDistancePairs(df: DataFrame, strCol: String, maxDist: Int,
      q: Int = 2): DataFrame = {
    require(maxDist >= 1 && q >= 1, "maxDist and q must be >= 1")
    val shortLen = q * (maxDist + 1) - 1
    val strs = df.select(col(strCol).as("s")).distinct()
      .filter(col("s").isNotNull)
      .select(col("s"), length(col("s")).as("len"))

    // multiset gram counts per string: (s, len, gram, cnt)
    val grams = strs
      .select(col("s"), col("len"),
        explode(graft.functions.TextFunctions.charNgrams(col("s"), q))
          .as("g"))
      .groupBy(col("s"), col("len"), col("g"))
      .agg(count(lit(1)).as("cnt"))
    val a = grams.select(col("s").as("sa"), col("len").as("la"),
      col("g"), col("cnt").as("ca"))
    val b = grams.select(col("s").as("sb"), col("len").as("lb"),
      col("g"), col("cnt").as("cb"))
    val gramCands = a.join(b, Seq("g"))
      .filter(col("sa") < col("sb") &&
        abs(col("la") - col("lb")) <= maxDist)
      .groupBy(col("sa"), col("sb"), col("la"), col("lb"))
      .agg(sum(least(col("ca"), col("cb"))).as("__shared"))
      .filter(col("__shared") >=
        greatest(col("la"), col("lb")) - lit(q - 1) - lit(maxDist * q))
      .select(col("sa"), col("sb"))

    // short×short band: the count bound cannot prune these
    val short = strs.filter(col("len") <= shortLen)
    val shortCands = short.select(col("s").as("sa"), col("len").as("la"))
      .join(short.select(col("s").as("sb"), col("len").as("lb")),
        col("sa") < col("sb") && abs(col("la") - col("lb")) <= maxDist)
      .select(col("sa"), col("sb"))

    gramCands.union(shortCands).distinct()
      .withColumn("dist", levenshtein(col("sa"), col("sb")))
      .filter(col("dist") <= maxDist)
      .select(col("sa").as("name_a"), col("sb").as("name_b"), col("dist"))
  }
}
