package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.functions.TextFunctions._
import graft.functions.HashFunctions._

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("token stats: counts and ratios") {
    val df = Seq((1L, "The quick, brown fox! It is fast.")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenStats(df, "doc_id", "text").head()
    assert(r.getAs[Int]("n_tokens") == 7)
    assert(r.getAs[Int]("n_chars") == 33)
    // 3 punct chars (, ! .) of 33
    assert(math.abs(r.getAs[Double]("punct_ratio") - 3.0 / 33) < 1e-3)
    // stopwords: the, it, is → 3/7
    assert(math.abs(r.getAs[Double]("stopword_ratio") - 3.0 / 7) < 1e-3)
  }

  test("empty text: zero ratios, no division errors") {
    val df = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val rows = TextAnalysis.tokenStats(df, "doc_id", "text").collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("n_tokens") == 0)
      assert(r.getAs[Double]("punct_ratio") == 0.0)
      assert(r.getAs[Double]("stopword_ratio") == 0.0)
      assert(r.isNullAt(r.fieldIndex("avg_token_len")))
    }
  }

  test("lang id picks the profile language") {
    val df = Seq(
      (1L, "the cat and the dog sat in the house that was warm"),
      (2L, "le chat et la maison dans les rues de la ville est une"),
      (3L, "der hund und die katze ist mit den kindern nicht da")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.langId(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "fr", 3L -> "de"))
  }

  test("repetition ratios: looped text scores high, diverse text low, short text 0") {
    val df = Seq(
      (1L, "buy now buy now buy now buy now buy now buy now"),
      (2L, "the quick brown fox jumps over one lazy sleeping dog today"),
      (3L, "hi")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionRatios(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got(1L)._1 > 0.7 && got(1L)._2 > 0.7, s"looped: ${got(1L)}")   // word 2/3-grams repeat
    assert(got(2L)._1 == 0.0 && got(2L)._2 == 0.0, s"diverse: ${got(2L)}")
    assert(got(3L) == ((0.0, 0.0, 0.0)), s"short: ${got(3L)}")            // below every n
    assert(got(1L)._3 > got(2L)._3, "char-gram repetition should rank looped above diverse")
  }

  test("charRepetitionRatio: multi-byte text stays in [0, 1] (byte denominator)") {
    // 30 distinct CJK chars = 90 UTF-8 bytes; a code-point denominator
    // (30-4=26) against ~86 distinct byte grams went to ~ -2.3
    val cjk = (0x4E00 until 0x4E1E).map(_.toChar).mkString
    val df = Seq((1L, cjk), (2L, ("一" * 40))).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionRatios(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(1L) >= 0.0 && got(1L) <= 1.0, s"diverse CJK: ${got(1L)}")
    assert(got(2L) > 0.9, s"looped CJK should score high: ${got(2L)}")
  }

  test("scoreLinearModel: empty/null-text docs score sigmoid(bias), not vanish") {
    val w = spark.range(8).select(col("id").as("bucket"),
      lit(0.5).as("weight"))
    val df = Seq((1L, "alpha beta"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextAnalysis.scoreLinearModel(df, "doc_id", "text", w,
      buckets = 8, bias = 0.25)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(2L) == ((0L, 0.25)) && got(3L) == ((0L, 0.25)))
    assert(got(1L)._1 == 2L && got(1L)._2 == 1.25)
  }

  test("quality score: clean prose > punctuation soup; empty -> 0") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs to the river where it drinks in peace today"),
      (2L, "!!! ??? ... ;;; ::: ,,, ''' \"\"\" ((( ))) --- !!!"),
      (3L, "")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.qualityScores(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) > 0.8)
    assert(got(2L) < 0.1)
    assert(got(3L) == 0.0)
  }

  test("custom hash expressions: deterministic, sensitive to input") {
    val df = Seq(Tuple1("abc"), Tuple1("abd"), Tuple1("abc")).toDF("s")
    val r = df.select(fnv64(col("s")).as("f"), polyFingerprint(col("s")).as("p")).collect()
    assert(r(0).getLong(0) == r(2).getLong(0))
    assert(r(0).getLong(0) != r(1).getLong(0))
    assert(r(0).getLong(1) == r(2).getLong(1))
    assert(r(0).getLong(1) != r(1).getLong(1))
    // poly hash closed form: "ab" = (97*31 + 98) % 1e9+7
    val ab = df.sparkSession.range(1).select(polyFingerprint(lit("ab"))).head().getLong(0)
    assert(ab == (97L * 31 + 98) % 1000000007L)
  }

  test("bpe-ish token count: contractions and punct runs counted as pieces") {
    val df = Seq(Tuple1("it's well-known: tokens matter 123 times")).toDF("s")
    val n = df.select(bpeishTokenCount(col("s"))).head().getInt(0)
    // it|'s| well|-|known|:| tokens| matter| 123| times
    assert(n == 10, s"got $n")
  }

  test("preTokenStats: letter/digit/punct runs split and counted") {
    val df = Seq((1L, "abc v1.2, x=42 abc!!")).toDF("id", "t")
    val r = TextAnalysis.preTokenStats(df, "id", "t").head()
    // abc|v|1|.|2|,|x|=|42|abc|!! → 11 pretokens, 10 distinct (abc twice),
    // numeric runs: 1, 2, 42
    assert(r.getInt(1) == 11, s"n_pretokens ${r.getInt(1)}")
    assert(r.getInt(2) == 10, s"n_distinct ${r.getInt(2)}")
    assert(r.getInt(3) == 3, s"n_numeric ${r.getInt(3)}")
  }

  test("winnowing: shared long substring guarantees shared fingerprint; disjoint text doesn't") {
    val shared = "the winnowing algorithm selects minima of rolling hash windows"
    val df = Seq(
      (1L, s"prefix one $shared suffix alpha"),
      (2L, s"completely different start $shared and another end"),
      (3L, "nothing in common with those documents at all whatsoever")
    ).toDF("doc_id", "text")
    val fps = df.select(col("doc_id"), winnowFingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps(1L) intersect fps(2L)).nonEmpty)
    assert((fps(1L) intersect fps(3L)).isEmpty)
  }

  test("shingles and char ngrams") {
    val df = Seq(Tuple1("a b c d")).toDF("s")
    val sh = df.select(wordShingles(col("s"), 2).as("sh")).head().getSeq[String](0)
    assert(sh == Seq("a b", "b c", "c d"))
    val ng = df.select(charNgrams(lit("abcd"), 2).as("ng")).head().getSeq[String](0)
    assert(ng == Seq("ab", "bc", "cd"))
    val short = df.select(charNgrams(lit("ab"), 5).as("ng")).head().getSeq[String](0)
    assert(short.isEmpty)
  }

  test("bm25: scores match an independent reference computation") {
    val corpus = Seq(
      (1L, "spark shuffle join spark spark"),   // tf(spark)=3, dl=5
      (2L, "spark vector search engine here"),  // both terms, dl=5
      (3L, "vector vector vector nothing else at all"),
      (4L, "completely unrelated words only"),
      (5L, "spark"))                            // short doc: length norm boost
    val df = corpus.toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(df, "doc_id", "text",
      terms = Seq("spark", "vector"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    // independent scalar BM25 (k1=1.2, b=0.75)
    val toksBy = corpus.map { case (id, t) => id -> t.split("\\s+").toSeq }.toMap
    val n = corpus.size.toDouble
    val avgdl = toksBy.values.map(_.size).sum.toDouble / n
    def score(id: Long): Double = Seq("spark", "vector").map { term =>
      val tf = toksBy(id).count(_ == term).toDouble
      val dfT = toksBy.values.count(_.contains(term)).toDouble
      val idf = math.log(1.0 + (n - dfT + 0.5) / (dfT + 0.5))
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * toksBy(id).size / avgdl))
    }.sum
    val expect = corpus.map(_._1).filter(id =>
        toksBy(id).contains("spark") || toksBy(id).contains("vector"))
      .map(id => (id, math.round(score(id) * 1e4) / 1e4))
      .sortBy { case (id, s) => (-s, id) }
    assert(got.map(r => (r._1, r._3)).toSeq == expect)
    // doc 4 (no query term) excluded; doc 2 hits both terms
    assert(!got.exists(_._1 == 4L))
    assert(got.find(_._1 == 2L).get._2 == 2L)
  }

  test("tfidfTopTerms: corpus-common terms rank below doc-specific ones") {
    val docs = Seq(
      (1L, "common common unique1 unique1 unique1"),
      (2L, "common other2"),
      (3L, "common other3")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    // 'common' has df=3 → idf=ln(1)=0 → ranks below any doc-specific term
    assert(got.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq
      == Seq("unique1", "common"))
    assert(got.filter(_._1 == 2L).sortBy(_._2).map(_._3).head == "other2")
  }

  test("pmiCollocations: repeated adjacent pair scores positive, counts exact") {
    val docs = (1L to 30L).map(i =>
      (i, s"alpha beta w$i filler${i % 3}")).toDF("doc_id", "text")
    val got = TextAnalysis.pmiCollocations(docs, "doc_id", "text", minCount = 5L)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    val ab = got(("alpha", "beta"))
    assert(ab._1 == 30L)     // every doc contributes the pair once
    assert(ab._2 > 0.0)      // strongly associated
  }

  test("bigramLmScores: hand-computed smoothed bigram log-probs") {
    // reference: "a b a b" + "a c" → bigrams: (a,b)x2, (b,a)x1, (a,c)x1
    // unigrams: a=3, b=2, c=1; V=3; α=0.4
    val ref = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScores(ref, ref, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def lp(c12: Long, c1: Long): Double =
      math.log((c12 + 0.4) / (c1 + 0.4 * 3.0))
    // doc 1: (a,b) (b,a) (a,b) in position order
    val d1 = -(lp(2, 3) + lp(1, 2) + lp(2, 3)) / 3.0
    val d2 = -lp(1, 3) / 1.0
    assert(got(1L)._1 == 3L && got(2L)._1 == 1L)
    // output is display-rounded to 4 decimals (see bigramLmScores)
    assert(math.abs(got(1L)._2 - d1) < 5e-5, s"${got(1L)._2} vs $d1")
    assert(math.abs(got(2L)._2 - d2) < 5e-5)
    // fluent text scores lower (better) than out-of-domain text
    val docs = Seq((10L, "a b a b a b"), (11L, "z z z z")).toDF("doc_id", "text")
    val s = TextAnalysis.bigramLmScores(ref, docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(10L) < s(11L), s"fluent ${s(10L)} should beat noise ${s(11L)}")
  }

  test("bm25FromIndex equals bm25TopK exactly (same docs, same doubles)") {
    val corpus = (1L to 60L).map { i =>
      (i, s"spark doc number $i ${if (i % 3 == 0) "vector merge" else "plain words"}" +
        (" filler" * (i % 5).toInt))
    }.toDF("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("graft_bm25_spec").toString
    TextAnalysis.buildBm25Index(corpus, "doc_id", "text", "t_bm25_spec", base)
    val fromIdx = TextAnalysis
      .bm25FromIndex(spark, "t_bm25_spec", Seq("spark", "vector", "merge"), 10)
    val direct = TextAnalysis
      .bm25TopK(corpus, "doc_id", "text", Seq("spark", "vector", "merge"), 10)
    // bit-exact equality including rank order — the shared score tree
    // guarantees identical doubles, not just close ones
    assert(fromIdx.collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      == direct.collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))))
  }

  test("appendToBm25Index: build half + append half equals the full-corpus scan path") {
    val corpus = (1L to 80L).map { i =>
      (i, s"spark doc number $i ${if (i % 4 == 0) "vector merge" else "plain words"}" +
        (" pad" * (i % 7).toInt))
    }.toDF("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("graft_bm25_incr_spec").toString
    TextAnalysis.buildBm25Index(corpus.filter(col("doc_id") <= 40),
      "doc_id", "text", "t_bm25_incr", base)
    TextAnalysis.appendToBm25Index(corpus.filter(col("doc_id") > 40),
      "doc_id", "text", "t_bm25_incr", base)
    val fromIdx = TextAnalysis
      .bm25FromIndex(spark, "t_bm25_incr", Seq("spark", "vector", "merge"), 12)
    val direct = TextAnalysis
      .bm25TopK(corpus, "doc_id", "text", Seq("spark", "vector", "merge"), 12)
    assert(fromIdx.collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      == direct.collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))))
    // rebuild over the same name must not resurrect old postings
    TextAnalysis.buildBm25Index(corpus.filter(col("doc_id") <= 40),
      "doc_id", "text", "t_bm25_incr", base)
    val n = spark.table("t_bm25_incr_stats").count()
    assert(n == 1L, s"rebuild left $n stats rows")
  }

  test("bm25: top-k is TakeOrdered (no global sort) over one broadcast stats row") {
    val df = (1L to 50L).map(i => (i, s"spark doc $i")).toDF("doc_id", "text")
    val plan = TextAnalysis.bm25TopK(df, "doc_id", "text", Seq("spark"), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
  }

  test("ngramNovelty: copied spans score low, unique text 1.0, short docs vacuous") {
    val shared = (1 to 10).map(i => s"tok$i").mkString(" ") // 10 toks → 3 8-grams
    val docs = Seq(
      (1L, shared), // all 3 grams also in doc 2
      (2L, shared + " tail1 tail2"), // 5 grams, first 3 shared
      (3L, (1 to 12).map(i => s"uniq$i").mkString(" ")), // fully novel
      (4L, "too short")).toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(docs, "doc_id", "text", 8)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_shared"),
          r.getAs[Double]("novelty")))).toMap
    assert(out(1L) == ((3L, 3L, 0.0)))
    assert(out(2L) == ((5L, 3L, 1.0 - 3.0 / 5)))
    assert(out(3L) == ((5L, 0L, 1.0)))
    assert(out(4L) == ((0L, 0L, 1.0)))
  }

  test("scoreLinearModel: hand-checked logits, partition-stable, broadcast join") {
    // one-token vocabulary with a known weight: logit = n_tokens * w
    val buckets = 64
    def bucketOf(tok: String): Long = java.lang.Math.floorMod(
      graft.functions.HashUtil.fnv64(
        org.apache.spark.unsafe.types.UTF8String.fromString(tok)), buckets.toLong)
    val (goodB, badB) = (bucketOf("good"), bucketOf("bad"))
    assume(goodB != badB) // fnv64 separates them at 64 buckets (it does)
    val weights = (0L until buckets.toLong)
      .map(b => (b, if (b == goodB) 0.25 else -0.125)).toDF("bucket", "weight")
    val docs = Seq((1L, "good good good good"), (2L, "bad bad"), (3L, "good bad"))
      .toDF("doc_id", "text")
    val scored = TextAnalysis.scoreLinearModel(docs, "doc_id", "text", weights, buckets)
    val byId = scored.collect().map(r =>
      r.getAs[Long]("doc_id") -> ((r.getAs[Double]("logit"), r.getAs[Boolean]("label")))).toMap
    assert(byId(1L)._1 == 1.0 && byId(1L)._2) // 4 × 0.25
    assert(byId(2L)._1 == -0.25 && !byId(2L)._2) // 2 × -0.125
    assert(byId(3L)._1 == 0.125 && byId(3L)._2) // 0.25 - 0.125
    val again = TextAnalysis.scoreLinearModel(
      docs.repartition(5), "doc_id", "text", weights, buckets)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("logit")).toMap
    assert(byId.view.mapValues(_._1).toMap == again)
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("ccnetBuckets: terciles split head/middle/tail by LM score") {
    // reference = natural text; docs = 3 natural (low ppl), 3 shuffled-ish
    val ref = (1 to 20).map(i => (100L + i, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the dog"),
      (3L, "quick brown fox jumps over the lazy"),
      (4L, "dog lazy the over jumps fox brown quick the"),
      (5L, "fox the dog brown quick lazy jumps over"),
      (6L, "zz yy xx ww vv uu tt ss")).toDF("doc_id", "text")
    val out = TextAnalysis.ccnetBuckets(ref, docs, "doc_id", "text")
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert(out.size == 6)
    assert(out(1L) == "head")              // exactly the reference sentence
    // NOTE the OOV doc (6) is NOT the tail: with add-alpha and no backoff
    // every OOV-conditioned bigram gets the uniform floor -ln(V), while a
    // shuffled doc pays ln((c1 + aV)/a) after COMMON words (c1 large) —
    // so scrambled-natural text scores worse than pure-OOV text
    assert(out(4L) == "tail" || out(5L) == "tail")
    // buckets are terciles: 2 docs each
    assert(out.values.groupBy(identity).view.mapValues(_.size).toMap ==
      Map("head" -> 2, "middle" -> 2, "tail" -> 2))
  }

  test("zipfFit: an exact power law recovers its slope") {
    // freq(term_r) = round(1000 / r): close to slope -1 over 20 ranks
    val docs = (1 to 20).flatMap(r =>
      Seq.fill(math.max(1000 / r, 1))(s"t$r%02d".format(r))).mkString(" ")
    val df = Seq((1L, docs)).toDF("doc_id", "text")
    val r = TextAnalysis.zipfFit(df, "text", topN = 20).collect()(0)
    assert(r.getAs[Long]("n_terms") == 20)
    val slope = r.getAs[Double]("slope")
    assert(slope < -0.95 && slope > -1.05, s"slope $slope")
  }

  test("zipfFit: uniform frequencies give slope 0") {
    val df = Seq((1L, "aa bb cc dd aa bb cc dd")).toDF("doc_id", "text")
    val r = TextAnalysis.zipfFit(df, "text").collect()(0)
    assert(r.getAs[Double]("slope") == 0.0)
  }

  test("trigramSearch: finds substrings, rerank kills trigram-only FPs") {
    val df = Seq(
      (1L, "the quick brown fox"),
      (2L, "quick the brown"),       // has all trigrams of "ck b"? no:
      (3L, "thick brows"),           // shares some trigrams, not substring
      (4L, "THE QUICK one")          // case-insensitive hit
    ).toDF("doc_id", "text")
    val hits = TextAnalysis.trigramSearch(df, "doc_id", "text", "he quick")
      .as[Long].collect().toSet
    assert(hits == Set(1L, 4L))
  }

  test("trigramSearch: non-contiguous trigram cooccurrence is rejected") {
    // doc has every trigram of "abcdef" but never contiguously
    val df = Seq((1L, "abcd xx cdef xx bcde"), (2L, "abcdef")).toDF("doc_id", "text")
    val hits = TextAnalysis.trigramSearch(df, "doc_id", "text", "abcdef")
      .as[Long].collect().toSet
    assert(hits == Set(2L))
  }

  test("trigramSearch rejects sub-trigram patterns") {
    val df = Seq((1L, "ab")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.trigramSearch(df, "doc_id", "text", "ab")
    }
  }

  test("bpeMerges: classic lower/lowest case learns (l,o) then (lo,w)") {
    // words: low x3, lowest x2 → pairs l-o:5, o-w:5, w-e:2, e-s:2, s-t:2
    // tie l-o vs o-w breaks lexicographically → (l,o) first; then
    // lo-w:5 dominates → (lo,w); then low-e:2 ties w-e? w gone; pairs
    // low-e:2, e-s:2, s-t:2 → (e,s) lexicographic
    val df = Seq("low low low lowest lowest").toDF("text")
    val out = TextAnalysis.bpeMerges(df, "text", numMerges = 3)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out(0) == ((1, "l", "o", 5L)))
    assert(out(1) == ((2, "lo", "w", 5L)))
    assert(out(2) == ((3, "e", "s", 2L)))
  }

  test("bpeMerges: overlapping runs merge left-to-right non-overlapping") {
    // "aaaa": pairs (a,a) weight 3 → merge → [aa, aa]; second round
    // (aa,aa) weight 1 → merge → [aaaa]
    val df = Seq("aaaa").toDF("text")
    val out = TextAnalysis.bpeMerges(df, "text", numMerges = 2)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out(0) == ((1, "a", "a", 3L)))
    assert(out(1) == ((2, "aa", "aa", 1L)))
  }

  test("bpeMerges: stops early when no pairs remain") {
    val df = Seq("ab ab").toDF("text")
    val out = TextAnalysis.bpeMerges(df, "text", numMerges = 5).collect()
    assert(out.length == 1) // after (a,b) every word is one symbol
  }

  test("bpeEncodeCensus: post-merge vocabulary with exact freq/word counts") {
    // words: aa x2, ab x1 → pair (a,a):2 beats (a,b):1 → merge (a,a)
    // symbols after 1 merge: aa → [aa], ab → [a, b]
    val df = Seq("aa aa ab").toDF("text")
    val out = TextAnalysis.bpeEncodeCensus(df, "text", numMerges = 1)
      .collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("freq"),
        r.getAs[Long]("n_words"))).toMap
    assert(out == Map("aa" -> ((2L, 1L)), "a" -> ((1L, 1L)),
      "b" -> ((1L, 1L))))
  }

  test("bpeEncodeCorpus: per-doc ids, left-to-right overlap ties, empty doc") {
    // words: aa(c=2), ab(1), aaa(1) → pair (a,a): 2 (from aa×2) + 2
    // (two overlapping pairs in aaa) = 4 beats (a,b): 1 → merge (a,a).
    // Post-merge splits: aa→[aa], ab→[a,b], aaa→[aa,a] (left-to-right
    // non-overlapping: the first two a's merge, the third stays).
    // Vocab sorted: a=0, aa=1, b=2.
    val df = Seq((1L, "aa aa ab"), (2L, "aaa"), (3L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bpeEncodeCorpus(df, "doc_id", "text", numMerges = 1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getString(4)))
      .toMap
    assert(out(1L) == ((3L, 4L, Some(1.3333), "1 1 0 2")))
    assert(out(2L) == ((1L, 2L, Some(2.0), "1 0")))
    assert(out(3L) == ((0L, 0L, None, "")))
  }

  test("distinctN: distinct/total grams per n, repetition lowers ratio") {
    // group g: "a a a" + "a b" -> unigrams a,a,a,a,b (2/5), bigrams
    // (a a),(a a),(a b) (2/3), trigrams (a a a) (1/1)
    val df = Seq((1L, "g", "a a a"), (2L, "g", "a b"))
      .toDF("doc_id", "src", "text")
    val out = TextAnalysis.distinctN(df, "text", "src")
      .collect().map(r => r.getInt(1) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(1) == ((5L, 2L, 0.4)))
    assert(out(2) == ((3L, 2L, 0.6667)))
    assert(out(3) == ((1L, 1L, 1.0)))
  }

  test("bpeRoundTrip: decode reconstructs every doc, empty doc included") {
    // same corpus as the encode test: ids decode back through the
    // frozen vocab and the subword concat equals the word concat for
    // every doc — including the empty one (0 tokens, 0 chars, ok)
    val df = Seq((1L, "aa aa ab"), (2L, "aaa"), (3L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bpeRoundTrip(df, "doc_id", "text", numMerges = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L) == ((4L, 6L, true)))
    assert(out(2L) == ((2L, 3L, true)))
    assert(out(3L) == ((0L, 0L, true)))
  }

  test("heapsFit: exact OLS over the known V(N) curve, nv=0 doc included") {
    // doc 2 adds no new vocabulary → exercises the left-join/coalesce(0)
    // path; curve points: (N,V) = (2,2), (4,2), (7,3)
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "a b c"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.heapsFit(df, "doc_id", "text").head()
    val xs = Seq(2.0, 4.0, 7.0).map(math.log)
    val ys = Seq(2.0, 2.0, 3.0).map(math.log)
    // same id-ordered fold sequence as the operator
    val sx = xs.foldLeft(0.0)(_ + _); val sy = ys.foldLeft(0.0)(_ + _)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.foldLeft(0.0)(_ + _)
    val sxx = xs.map(a => a * a).foldLeft(0.0)(_ + _)
    val n = 3.0
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    def r4(v: Double) =
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Long]("n_docs") == 3)
    assert(r.getAs[Double]("beta") == r4(slope))
    assert(r.getAs[Double]("ln_k") == r4((sy - slope * sx) / n))
  }

  test("exactSubstrCensus: first occurrence survives, later copies lose the span") {
    val span = (1 to 8).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, span + " tail1 tail2"),          // first occurrence: kept
      (2L, "head " + span),                 // duplicate: 8 tokens removed
      (3L, "no shared span here at all x y z"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.exactSubstrCensus(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_removed") == 0L)
    assert(out(2L).getAs[Long]("n_tokens") == 9L)
    assert(out(2L).getAs[Long]("n_removed") == 8L)
    assert(out(2L).getAs[Long]("n_kept") == 1L)
    assert(out(2L).getAs[Double]("removed_frac") == 0.8889)
    assert(out(3L).getAs[Long]("n_removed") == 0L)
  }

  test("exactSubstrCensus: overlapping duplicate spans cover the union") {
    // doc 2 repeats a 9-token run of doc 1 -> two overlapping dup
    // 8-grams in doc 2, union coverage 9 tokens (not 16)
    val run = (1 to 9).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, run + " x"), (2L, run + " unique")).toDF("doc_id", "text")
    val out = TextAnalysis.exactSubstrCensus(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(2L).getAs[Long]("n_removed") == 9L)
    assert(out(1L).getAs[Long]("n_removed") == 0L)
  }

  test("oovAudit: occurrences vs types split, rate exact") {
    val df = Seq(
      ("s1", "aa aa aa bb"),   // aa dominates the vocab
      ("s2", "aa zz zz yy"))   // zz/yy fall outside a 2-token vocab
      .toDF("source", "text")
    val out = TextAnalysis.oovAudit(df, "source", "text", vocabSize = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    // vocab = {aa (4), zz (2)} by (count DESC, token)
    val s1 = out("s1")
    assert(s1.getAs[Long]("n_tokens") == 4L && s1.getAs[Long]("n_types") == 2L)
    assert(s1.getAs[Long]("n_oov_tokens") == 1L) // bb
    assert(s1.getAs[Double]("oov_rate") == 0.25)
    val s2 = out("s2")
    assert(s2.getAs[Long]("n_oov_tokens") == 1L) // yy only; zz is in vocab
    assert(s2.getAs[Long]("n_oov_types") == 1L)
  }

  test("vocabJaccard: exact set overlap on the aggregated frame") {
    val df = Seq(
      ("a", "x y z"), ("a", "x x w"),      // vocab(a) = {x,y,z,w}
      ("b", "x y q"),                        // vocab(b) = {x,y,q}
      ("c", "zz"))                           // disjoint from a and b
      .toDF("source", "text")
    val out = TextAnalysis.vocabJaccard(df, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = out(("a", "b"))
    assert(ab.getAs[Long]("n_vocab_1") == 4L &&
      ab.getAs[Long]("n_vocab_2") == 3L)
    assert(ab.getAs[Long]("n_common") == 2L) // x, y
    assert(ab.getAs[Double]("jaccard") == 0.4) // 2 / (4+3-2)
    // disjoint pairs are absent, not zero rows
    assert(out.keySet == Set(("a", "b")))
  }

  test("phraseSearch: counts consecutive-token occurrences only") {
    val df = Seq(
      (1L, "big data is big data is big data"), // 3 occurrences
      (2L, "data big is big"),                  // adjacency reversed: 0
      (3L, "big data"),                         // exactly the phrase: 1
      (4L, "big"),                              // shorter than phrase
      (5L, "the big data pipeline"))            // mid-sentence: 1
      .toDF("doc_id", "text")
    val out = TextAnalysis.phraseSearch(df, "doc_id", "text",
      Seq("big", "data")).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_occurrences")).toMap
    assert(out == Map(1L -> 3L, 3L -> 1L, 5L -> 1L))
    // three-token phrase, overlap-free counting
    val tri = TextAnalysis.phraseSearch(df, "doc_id", "text",
      Seq("big", "data", "is")).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_occurrences")).toMap
    assert(tri == Map(1L -> 2L))
  }

  test("vocabNovelty: first-seen ownership per batch") {
    import org.apache.spark.sql.functions.expr
    // batch 0: {a,b}; batch 1: {b,c}; batch 2: {a,c} → novelty
    // 2/2, 1/2, 0/2
    val df = Seq((0L, "a b"), (1L, "b c"), (2L, "a c"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.vocabNovelty(df, "text", expr("doc_id"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_new_tokens"), r.getAs[Double]("novelty_rate")))
      .toMap
    assert(out(0L) == (2L, 1.0))
    assert(out(1L) == (1L, 0.5))
    assert(out(2L) == (0L, 0.0))
  }

  test("skipgramPmi: window pairs, canonical order, min-count floor") {
    // "a b" adjacent 6× and "a _ b" at distance 2 via "a c b" 2× →
    // pair (a,b) counted at both offsets; self-pairs dropped
    val df = Seq.fill(6)((1L, "a b")) ++ Seq.fill(2)((2L, "a c b")) ++
      Seq.fill(5)((3L, "z z"))
    val out = TextAnalysis.skipgramPmi(df.toDF("doc_id", "text"),
      "text", window = 2, minCount = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Long]("pair_count")).toMap
    // (a,b): 6 adjacent + 2 distance-2 = 8 ≥ 5 → kept; (a,c)/(c,b)
    // appear 2× each → floored out; (z,z) self-pair → dropped
    assert(out.keySet == Set(("a", "b")))
    assert(out(("a", "b")) == 8L)
  }

  test("goodTuring: frequency-of-frequencies and unseen mass") {
    // a:1, b:1, c:2, d:3 → N=7, N1=2, N2=1, N3=1
    val df = Seq((1L, "a b c d"), (2L, "c d d")).toDF("doc_id", "text")
    val out = TextAnalysis.goodTuring(df, "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L).getAs[Long]("n_c") == 2L)
    // c* for c=1: (1+1)·N2/N1 = 2·1/2 = 1.0
    assert(out(1L).getAs[Double]("c_star") == 1.0)
    // c=3 has no N4 → NULL c*
    assert(out(3L).isNullAt(out(3L).fieldIndex("c_star")))
    assert(out(1L).getAs[Long]("total_tokens") == 7L)
    // p0 = N1/N = 2/7 ≈ 0.2857
    assert(out(1L).getAs[Double]("unseen_mass") == 0.2857)
  }

  test("kwic: windows clamp at document edges") {
    val df = Seq(
      (1L, "fast start middle words here fast end"),
      (2L, "no match here"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.kwic(df, "doc_id", "text", "fast")
      .collect().map(r => (r.getLong(0), r.getAs[Int]("pos")) ->
        r.getAs[String]("context")).toMap
    // pos 1: left edge clamps; pos 6: right edge clamps
    assert(out((1L, 1)) == "fast start middle words")
    assert(out((1L, 6)) == "middle words here fast end")
    assert(out.size == 2)
  }

  test("readability: integer counts and the Flesch formula") {
    val df = Seq(
      (1L, "the cat sat. the dog ran!"),  // 6 words, 2 sentences, 6 syl
      (2L, "rhythm myths"),               // y-vowels: 2 words, 1 sent, 2 syl
      (3L, ""))                           // empty: excluded
      .toDF("doc_id", "text")
    val out = TextAnalysis.readability(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(3L))
    val r1 = out(1L)
    assert(r1.getAs[Int]("n_words") == 6)
    assert(r1.getAs[Int]("n_sentences") == 2)
    assert(r1.getAs[Long]("n_syllables") == 6L)
    // 206.835 − 1.015·3 − 84.6·1 = 119.19
    assert(r1.getAs[Double]("flesch") == 119.19)
    val r2 = out(2L)
    // "rhythm" → one [aeiouy]+ run (y), "myths" → one
    assert(r2.getAs[Long]("n_syllables") == 2L)
    assert(r2.getAs[Int]("n_sentences") == 1)
  }

  test("jsDivergence: identical distributions give 0, disjoint give ln 2") {
    val same = Seq(("a", "x y z"), ("b", "x y z")).toDF("source", "text")
    val r0 = TextAnalysis.jsDivergence(same, "source", "text")
      .collect().head
    assert(r0.getAs[Long]("n_shared_tokens") == 3L)
    assert(r0.getAs[Double]("js_divergence") == 0.0)
    // fully disjoint vocabularies: JS = ln 2 ≈ 0.6931 (the upper bound)
    val disj = Seq(("a", "x x y"), ("b", "u v w")).toDF("source", "text")
    val r1 = TextAnalysis.jsDivergence(disj, "source", "text")
      .collect().head
    assert(r1.getAs[Long]("n_shared_tokens") == 0L)
    assert(r1.getAs[Double]("js_divergence") == 0.6931)
  }

  test("cdcChunks: content-defined boundaries are edit-local, dup chunks counted") {
    // Find a boundary token empirically so the test doesn't hardcode
    // FNV internals: scan candidates for hash % 16 == 0
    val cand = (0 until 4000).map(i => s"tok$i").toDF("w")
      .withColumn("m", pmod(fnv64(col("w")), lit(16L)))
    val boundary = cand.filter(col("m") === 0).select("w").as[String].head()
    val plain = (1 to 5).map(i => s"u$i")   // no boundary tokens
    // doc 1 and 2 share an identical chunk (ended by the boundary tok);
    // doc 3 is all unique with no boundary -> single chunk, no dups
    val shared = Seq("alpha", "beta", boundary)
    val docs = Seq(
      (1L, (shared ++ Seq("tail1")).mkString(" ")),
      (2L, (shared ++ Seq("tail2")).mkString(" ")),
      (3L, plain.mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.cdcChunks(docs, "doc_id", "text", modulus = 16)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // docs 1/2: chunks = ["alpha beta <boundary>", "tailN"]; the first
    // chunk is shared -> 3 dup tokens each; doc 3: one unique chunk
    assert(out(1L) == ((4L, 2L, 3L)))
    assert(out(2L) == ((4L, 2L, 3L)))
    assert(out(3L) == ((5L, 1L, 0L)))
  }

  test("keyness: the focus-only term tops the table, direction follows rates") {
    // focus docs hammer 'zap'; rest hammer 'bop'; 'the' is balanced
    val docs = Seq(
      (true, "zap zap zap zap the the"),
      (true, "zap zap the"),
      (false, "bop bop bop the the"),
      (false, "bop the"))
      .toDF("f", "text")
    val out = TextAnalysis.keyness(docs, "text", col("f"), topK = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(4)))
    // zap: (6,0) focus-only; bop: (0,4) rest-only; both beat 'the'
    assert(out.map(_._1).take(2).toSet == Set("zap", "bop"))
    val byTerm = out.map(t => t._1 -> t).toMap
    assert(byTerm("zap")._4 == "focus" && byTerm("bop")._4 == "rest")
    assert(byTerm("zap")._2 == 6L && byTerm("bop")._3 == 4L)
  }

  test("tokenGini: equal docs 0, one-doc dominance high, null text counts 0") {
    val eq = Seq(("a", 1L, "x y z"), ("a", 2L, "p q r"), ("a", 3L, "m n o"))
    // group b: 1-token docs + one 38-token doc
    val dom = (1L to 9L).map(i => ("b", 10L + i, "w")) :+
      (("b", 30L, Seq.fill(38)("t").mkString(" ")))
    val df = (eq ++ dom).toDF("source", "doc_id", "text")
    val out = TextAnalysis.tokenGini(df, "doc_id", "text", "source")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("a") == ((3L, 9L, 0.0)))
    // b: n=10, sum=47, ranks 1..9 on the 1s, rank 10 on 38:
    // gini = (2*(45 + 380) - 11*47) / (10*47) = 333/470 = 0.7085
    assert(out("b") == ((10L, 47L, 0.7085)))
  }

  test("lexicalDiversity: all-hapax K=0, one-token dominance high K, no-token group absent") {
    val df = Seq(
      ("hapax", "alpha beta gamma"), ("hapax", "delta epsilon"),
      // 10 copies of one token + 2 singletons: N=12, types=3,
      // s2 = 100+1+1 = 102 → K = 1e4*(102-12)/144 = 6250.0
      ("tmpl", Seq.fill(10)("spam").mkString(" ") + " egg ham"),
      ("empty", "   "))
      .toDF("source", "text")
    val out = TextAnalysis.lexicalDiversity(df, "text", "source")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    // hapax: N=5, types=5, hapax=5, s2=5 → ttr=1, hapax=1, K=0
    assert(out("hapax") == ((5L, 5L, 5L, 1.0, 1.0, 0.0)))
    assert(out("tmpl") == ((12L, 3L, 2L, 0.25, 0.6667, 6250.0)))
    assert(!out.contains("empty")) // whitespace-only text → no row
  }

  test("unigramCrossEntropy: uniform corpus = ln V, rare-token doc scores higher") {
    // 4 tokens, each appearing once → every doc's CE = ln 4
    val uni = Seq((1L, "aa bb"), (2L, "cc dd")).toDF("doc_id", "text")
    val u = TextAnalysis.unigramCrossEntropy(uni, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val ln4 = math.rint(math.log(4.0) * 10000) / 10000
    assert(u(1L) == ((2L, ln4)) && u(2L) == ((2L, ln4)))
    // common-vocab doc beats rare-token doc
    val mix = Seq((1L, "the the the the the"), (2L, "the zyx"),
      (3L, "the the")).toDF("doc_id", "text")
    val m = TextAnalysis.unigramCrossEntropy(mix, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(m(2L) > m(1L) && m(3L) == m(1L)) // all-'the' docs equal
  }

  test("vocabCoverage: top-k ties break on token string; OOV occurrences counted") {
    // counts: the=4, zz=2, aa=2 → k=2 vocab = {the, aa} (aa < zz on ties)
    val df = Seq((1L, "the the aa zz"), (2L, "the the aa zz"),
      (3L, "qq")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabCoverage(df, "doc_id", "text", k = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((4L, 3L, 0.75)) && out(2L) == ((4L, 3L, 0.75)))
    assert(out(3L) == ((1L, 0L, 0.0))) // fully OOV doc still reports
  }

  test("unseenVocab: hand-computed Good-Turing mass and Chao1 floor") {
    import spark.implicits._
    val df = Seq(
      ("g1", "a a b c"),   // N=4, D=3, N1=2, N2=1 → P0=.5, chao1=3+4/2=5
      ("g2", "a a b b"),   // N1=0, N2=2 → P0=0, chao1=2
      ("g3", "a b")        // N2=0 → chao1 NULL
    ).toDF("g", "text")
    val out = TextAnalysis.unseenVocab(df, "g", "text").collect()
      .map(r => r.getString(0) -> r).toMap
    val g1 = out("g1")
    assert(g1.getAs[Long]("n_tokens") == 4L)
    assert(g1.getAs[Long]("vocab_observed") == 3L)
    assert(g1.getAs[Long]("n_singletons") == 2L)
    assert(g1.getAs[Double]("p_unseen") == 0.5)
    assert(g1.getAs[Double]("chao1_richness") == 5.0)
    assert(out("g2").getAs[Double]("p_unseen") == 0.0)
    assert(out("g2").getAs[Double]("chao1_richness") == 2.0)
    assert(out("g3").isNullAt(out("g3").fieldIndex("chao1_richness")))
  }

  test("htmlExtract: title group, link census, tag strip; missing title nulls") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "<html><head><title>Hello World</title></head>" +
        "<body><p>ab cd</p><a href=\"x\">l</a><a href=\"y\">m</a></body></html>"),
      (2L, "<body><p>no title here</p></body>"),
      (3L, "plain text, no tags at all")).toDF("id", "h")
    val out = TextAnalysis.htmlExtract(df, "id", col("h"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("title") == "Hello World")
    assert(out(1L).getAs[Long]("n_links") == 2L)
    // stripped: "Hello World" + "ab cd" + "l" + "m" = 11 + 5 + 1 + 1
    assert(out(1L).getAs[Long]("text_chars") == 18L)
    assert(out(2L).isNullAt(out(2L).fieldIndex("title")))
    assert(out(2L).getAs[Long]("n_links") == 0L)
    assert(out(3L).getAs[Long]("text_chars") == 26L)
    // zero-shuffle plan
    val p = TextAnalysis.htmlExtract(df, "id", col("h"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), "htmlExtract must not shuffle")
  }

  test("mainContent: length gate, link-density gate, exact char accounting") {
    import spark.implicits._
    val prose = "This paragraph carries enough plain prose to clear the gate."
    val html =
      s"""<html><body><div><a href="/a">Home</a> <a href="/b">About</a></div>
         |<p>$prose</p>
         |<p>tiny</p>
         |<div>List: <a href="/x">a long anchor text block here</a> and
         | <a href="/y">another long anchor text right there</a> ok</div>
         |</body></html>""".stripMargin
    val df = Seq((1L, html)).toDF("id", "h")
    val out = TextAnalysis.mainContent(df, "id", col("h")).collect()(0)
    // blocks: nav div (density), prose p (kept), tiny p (length),
    // link-list div (density), tail
    assert(out.getAs[Long]("n_blocks") == 5L)
    assert(out.getAs[Long]("n_kept") == 1L)
    assert(out.getAs[String]("main_text") == prose)
    assert(out.getAs[Long]("main_chars") == prose.length.toLong)
    // main + boiler = total collapsed text chars, exactly
    val total = out.getAs[Long]("main_chars") + out.getAs[Long]("boiler_chars")
    val collapsed = Seq("Home About", prose, "tiny",
      "List: a long anchor text block here and another long anchor " +
        "text right there ok", "").map(_.length.toLong).sum
    assert(total == collapsed)
  }

  test("mainContent: density boundary is an exact integer cross-multiply") {
    import spark.implicits._
    // text 40 chars, anchor 12 chars -> 1200 <= 40*30 kept (equality)
    val at = "twelve chars"
    val pad = "x" * (40 - at.length)
    val htmlEq = s"""<p><a href="/l">$at</a>$pad</p>"""
    // one extra anchor char tips it over
    val htmlOver = s"""<p><a href="/l">${at}s</a>${pad.drop(1)}</p>"""
    val df = Seq((1L, htmlEq), (2L, htmlOver)).toDF("id", "h")
    val out = TextAnalysis.mainContent(df, "id", col("h"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_kept")).toMap
    assert(out(1L) == 1L)
    assert(out(2L) == 0L)
  }

  test("mainContent: zero-shuffle plan") {
    import spark.implicits._
    val df = Seq((1L, "<p>x</p>")).toDF("id", "h")
    val p = TextAnalysis.mainContent(df, "id", col("h"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), "mainContent must not shuffle")
  }
}
