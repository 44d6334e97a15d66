package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval composition: fuse independently-produced ranked lists
  * (lexical BM25, embedding ANN, …) into one ranking — the standard
  * retrieval shape for training-data curation (hard-negative mining,
  * dedup-aware sampling) and RAG serving.
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    * `fused(d) = Σ_i 1 / (c + rank_i(d))`, items absent from a list
    * contribute 0 for it. Rank-based fusion needs no score calibration
    * between lists — exactly why it wins for BM25 ⊕ cosine.
    *
    * Inputs are TOP-K lists (each `(idCol, rankCol)`, rank 1-based) —
    * bounded by construction, so the full-outer joins here are trivial
    * (≤ Σ k_i rows); all the heavy lifting stays in the list producers,
    * which use the scale paths (bucketed BM25 postings, IVF/LSH ANN).
    * Ordering runs on the raw double (same both engines: 1.0/(c+rank)
    * summed in list order), ties broken by id; the score is emitted
    * UNROUNDED — identical doubles need no display rounding, and
    * rounding is where Spark and SQL oracles disagree.
    */
  def rrf(lists: Seq[DataFrame], idCol: String, rankCol: String,
      k: Int, c: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrf needs at least one ranked list")
    val keyed = lists.zipWithIndex.map { case (df, i) =>
      df.select(col(idCol).as("id"), col(rankCol).as(s"__r$i"))
    }
    val joined = keyed.reduce((a, b) => a.join(b, Seq("id"), "full_outer"))
    val score = lists.indices.map { i =>
      when(col(s"__r$i").isNotNull,
        lit(1.0) / (lit(c.toDouble) + col(s"__r$i").cast("double")))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    val nLists = lists.indices.map(i =>
      when(col(s"__r$i").isNotNull, 1).otherwise(0)).reduce(_ + _)
    joined
      .select(col("id"), nLists.cast("long").as("n_lists"), score.as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("id"))
      .limit(k)
  }

  /** Rank-biased overlap (Webber, Moffat & Zobel, TOIS 2010), truncated
    * at depth `k`: RBO_k = (1−p)·Σ_{d=1..k} p^{d−1}·|A_d ∩ B_d|/d where
    * A_d/B_d are the depth-d prefixes. THE top-weighted similarity
    * between two rankings of the same query — served-index vs exact ANN,
    * yesterday's index vs today's — strictly more informative than
    * set-recall because disagreement at rank 1 costs more than at rank
    * k. p (the persistence) sets the weight decay; 0.9 ≈ "the top ~10
    * ranks carry ~86% of the mass".
    *
    * Scale/determinism: both inputs are top-k lists, so every group
    * folds over two ≤k arrays (k² intersect work per group, k small by
    * construction); the weight p^{d−1} is carried MULTIPLICATIVELY
    * through the fold (no pow() — library pow is not guaranteed
    * correctly rounded the same way in both engines), giving one fixed
    * IEEE sequence the SQL oracle replays term for term.
    */
  def rankBiasedOverlap(a: DataFrame, b: DataFrame, groupCol: String,
      idCol: String, rankCol: String, p: Double, k: Int): DataFrame = {
    require(p > 0 && p < 1, "persistence p must be in (0, 1)")
    require(k >= 1, "k must be >= 1")
    def lst(df: DataFrame, out: String): DataFrame =
      df.filter(col(rankCol) <= k)
        .groupBy(col(groupCol))
        .agg(transform(array_sort(collect_list(
          struct(col(rankCol).cast("int").as("r"), col(idCol).as("id")))),
          s => s.getField("id")).as(out))
    lst(a, "__la").join(lst(b, "__lb"), Seq(groupCol))
      .select(col(groupCol),
        round(
          aggregate(sequence(lit(1), lit(k)),
            struct(lit(0.0).as("acc"), lit(1.0).as("w")),
            (s, d) => struct(
              (s.getField("acc") + s.getField("w") *
                (size(array_intersect(slice(col("__la"), lit(1), d),
                  slice(col("__lb"), lit(1), d))).cast("double") /
                  d.cast("double"))).as("acc"),
              (s.getField("w") * lit(p)).as("w")),
            s => s.getField("acc") * lit(1.0 - p)),
          4).as("rbo"))
  }

  /** nDCG@k over a ranked list with BINARY relevance (relCol ∈ {0, 1}):
    * DCG folds gain/log2(rank+1) in rank order; the ideal DCG comes
    * from `totals` — the per-group count of ALL relevant items in the
    * corpus (the ideal ranking puts them first, each with gain 1), so a
    * ranking that found everything findable scores 1.0 even when fewer
    * than k relevant items exist. Binary-only by construction: the
    * normalizer sums 1/log2(d+1), so graded gains > 1 would yield
    * nDCG > 1 — use [[ndcgAtKGraded]] for graded relevance (round-8
    * advisory). Groups with zero relevant items emit NULL (undefined,
    * not 0 — the q-null convention).
    *
    * log2 is spelled ln(x)/ln(2) in BOTH engines — DuckDB's native
    * log2() and a ratio of lns can differ in the last ulp.
    */
  def ndcgAtK(ranked: DataFrame, groupCol: String, rankCol: String,
      relCol: String, totals: DataFrame, totalCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    def log2(c: org.apache.spark.sql.Column) = log(c) / log(lit(2.0))
    val dcg = ranked.filter(col(rankCol) <= k)
      .groupBy(col(groupCol))
      .agg(aggregate(
        transform(array_sort(collect_list(
          struct(col(rankCol).cast("int").as("r"),
            col(relCol).cast("double").as("g")))),
          s => s.getField("g") / log2(s.getField("r").cast("double") + lit(1.0))),
        lit(0.0), (acc, x) => acc + x).as("__dcg"))
    dcg.join(totals.select(col(groupCol), col(totalCol).cast("long").as("__nrel")),
        Seq(groupCol))
      .select(col(groupCol), col("__nrel").as("n_relevant"),
        when(col("__nrel") > 0,
          round(col("__dcg") / aggregate(
            sequence(lit(1).cast("long"), least(lit(k.toLong), col("__nrel"))),
            lit(0.0),
            (acc, d) => acc + lit(1.0) / log2(d.cast("double") + lit(1.0))),
            4))
          .as("ndcg"))
  }

  /** nDCG@k with GRADED relevance: the ideal DCG is computed from the
    * corpus itself — `corpusGains` holds one row per relevant item
    * (group, gain > 0); per group the gains are sorted descending and
    * the top-min(k, n) fold Σ gain_d / log2(d+1) is the normalizer, so
    * graded gains can never push nDCG past 1.0 (the defect the binary
    * form's count-based normalizer would have — round-8 advisory).
    *
    * Determinism: both folds run over array_sort-fixed orders (rank
    * order for DCG, ideal-depth order for IDCG). The ideal top-k comes
    * from a row_number window over gain DESC — tie order among equal
    * gains is plan-dependent, but ties are equal doubles, so neither
    * the selected multiset nor the depth-weighted sum can change.
    * Groups with no positive corpus gain emit NULL.
    *
    * Scale: the ideal side is a windowed top-k (one shuffle on the
    * group key, per-partition sort, k rows kept) — never a per-group
    * collect of the full relevance list — plus a map-side-partial
    * count; both join back as k-bounded frames.
    */
  def ndcgAtKGraded(ranked: DataFrame, groupCol: String, rankCol: String,
      relCol: String, corpusGains: DataFrame, gainCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    def log2(c: org.apache.spark.sql.Column) = log(c) / log(lit(2.0))
    def depthFold(rCol: String, gCol: String)(df: DataFrame, out: String) =
      df.groupBy(col(groupCol))
        .agg(aggregate(
          transform(array_sort(collect_list(
            struct(col(rCol).cast("int").as("r"),
              col(gCol).cast("double").as("g")))),
            s => s.getField("g") /
              log2(s.getField("r").cast("double") + lit(1.0))),
          lit(0.0), (acc, x) => acc + x).as(out))
    val dcg = depthFold(rankCol, relCol)(
      ranked.filter(col(rankCol) <= k), "__dcg")
    val pos = corpusGains.filter(col(gainCol) > 0)
      .select(col(groupCol), col(gainCol).cast("double").as("__g"))
    val wIdeal = Window.partitionBy(col(groupCol)).orderBy(col("__g").desc)
    val idcg = depthFold("__d", "__g")(
      pos.withColumn("__d", row_number().over(wIdeal))
        .filter(col("__d") <= k), "__idcg")
    val nRel = pos.groupBy(col(groupCol)).agg(count(lit(1)).as("n_relevant"))
    dcg.join(idcg, Seq(groupCol), "left")
      .join(nRel, Seq(groupCol), "left")
      .select(col(groupCol),
        coalesce(col("n_relevant"), lit(0L)).as("n_relevant"),
        when(col("__idcg") > 0, round(col("__dcg") / col("__idcg"), 4))
          .as("ndcg"))
  }

  /** Reciprocal rank @k per group: 1/rank of the FIRST relevant item
    * in the top-k, 0.0 when nothing relevant ranked (the MRR convention
    * — callers average `rr` for the headline MRR). The first-hit
    * complement of [[ndcgAtK]] (position-weighted whole-list quality)
    * and RBO (list agreement): "how far does a user scroll to the first
    * good result". Exact integer rank + one divide; groups come from
    * the ranked frame itself, so unjudged groups report rr = 0 rather
    * than silently dropping.
    */
  def reciprocalRank(ranked: DataFrame, groupCol: String, rankCol: String,
      relCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val groups = ranked.select(col(groupCol)).distinct()
    val first = ranked.filter(col(rankCol) <= k && col(relCol) > 0)
      .groupBy(col(groupCol))
      .agg(min(col(rankCol).cast("long")).as("first_relevant_rank"))
    groups.join(first, Seq(groupCol), "left")
      .select(col(groupCol), col("first_relevant_rank"),
        coalesce(round(lit(1.0) / col("first_relevant_rank").cast("double"), 4),
          lit(0.0)).as("rr"))
  }
  /** Catalog coverage and novelty of a top-k recommendation frame —
    * the BEYOND-accuracy health metrics (Castells & Vargas 2022 survey
    * framing): nDCG says lists are relevant; these say whether the
    * system shows users anything beyond the same few popular items.
    * Coverage = share of the catalog that appears in ANY list; novelty
    * = mean over recommendation instances of −log₂(item share of
    * lists) — self-information of how widely each shown item is shown;
    * max_item_share flags popularity collapse.
    *
    * `recs` is (groupCol, itemCol) — one row per recommendation
    * instance; `catalogSize` is the eligible-item count the caller
    * measured. Per-item −log₂ terms round 4dp (the ndcgAtK ln-ulp
    * convention) then weight by exact frequencies into a DECIMAL fold.
    * One summary row. Scale: two partial-aggs over narrow rows.
    */
  def coverageNovelty(recs: DataFrame, groupCol: String, itemCol: String,
      catalogSize: Long): DataFrame = {
    def log2(c: org.apache.spark.sql.Column) = log(c) / log(lit(2.0))
    val base = recs.select(col(groupCol).as("__g"), col(itemCol).as("__i"))
      .filter(col("__g").isNotNull && col("__i").isNotNull)
    val users = base.agg(count_distinct(col("__g")).as("__nu"))
    val items = base.groupBy(col("__i")).agg(count(lit(1)).as("__f"))
      .crossJoin(broadcast(users))
    val term = round(-log2(col("__f").cast("double") /
      col("__nu").cast("double")), 4).cast("decimal(18,4)")
    items
      .agg(count(lit(1)).as("n_distinct_recommended"),
        sum(col("__f")).as("__nrec"),
        sum(term * col("__f")).cast("decimal(38,4)").as("__nov"),
        max(col("__f")).as("__maxf"),
        first(col("__nu")).as("__nu2"))
      .select(col("__nu2").as("n_users"),
        lit(catalogSize).as("catalog_size"),
        col("n_distinct_recommended"),
        round(col("n_distinct_recommended").cast("double") /
          lit(catalogSize.toDouble), 4).as("coverage"),
        round(col("__nov").cast("double") / col("__nrec").cast("double"), 4)
          .as("novelty"),
        round(col("__maxf").cast("double") / col("__nu2").cast("double"), 4)
          .as("max_item_share"))
  }

}
