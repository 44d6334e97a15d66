package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class QualityRulesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // --- gopherRepetition -------------------------------------------------

  test("gopherRepetition: fully repeated doc maxes every signal") {
    // 20 identical tokens → 2 identical 10-token lines; every gram repeats
    val txt = Seq.fill(20)("spam").mkString(" ")
    val df = Seq((1L, txt)).toDF("id", "text")
    val r = QualityRules.gopherRepetition(df, "id", "text").collect()(0)
    assert(r.getAs[Int]("n_lines") == 2)
    assert(r.getAs[Double]("dup_line_frac") == 0.5)    // 1 distinct of 2
    assert(r.getAs[Double]("dup_line_char_frac") == 0.5)
    // top 2-gram "spam spam" occurs 19x, 9 chars each, text 99 chars
    assert(r.getAs[Double]("top2_char_frac") == 19.0 * 9 / 99)
    assert(r.getAs[Double]("dup5_char_frac") == 16.0 * 24 / 99)
  }

  test("gopherRepetition: all-distinct doc scores zero everywhere") {
    val txt = (1 to 30).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, txt)).toDF("id", "text")
    val r = QualityRules.gopherRepetition(df, "id", "text").collect()(0)
    assert(r.getAs[Double]("dup_line_frac") == 0.0)
    assert(r.getAs[Double]("dup_line_char_frac") == 0.0)
    assert(r.getAs[Double]("dup5_char_frac") == 0.0)
    // top 2-gram occurs once; covers its own chars only
    assert(r.getAs[Double]("top2_char_frac") > 0.0)
    assert(r.getAs[Double]("top2_char_frac") < 0.1)
  }

  test("gopherRepetition: top-gram tie breaks to lexicographically smallest") {
    // "b b" and "a a" both occur once... make counts tie at 2:
    // tokens: a a a  → "a a" x2 ; b b b → "b b" x2
    val df = Seq((1L, "a a a b b b")).toDF("id", "text")
    val r = QualityRules.gopherRepetition(df, "id", "text").collect()(0)
    // both 2-grams "a a" (2x), "b b" (2x), "a b" (1x): winner "a a",
    // 3 chars, 2 occurrences, text 11 chars
    assert(r.getAs[Double]("top2_char_frac") == 2.0 * 3 / 11)
  }

  test("gopherRepetition: empty/short docs yield zeros, rows preserved") {
    val df = Seq((1L, ""), (2L, "one")).toDF("id", "text")
    val rows = QualityRules.gopherRepetition(df, "id", "text")
      .orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Int]("n_lines") == 0)
    assert(rows(0).getAs[Double]("top2_char_frac") == 0.0)
    assert(rows(1).getAs[Int]("n_lines") == 1)   // one short line
    assert(rows(1).getAs[Double]("dup5_char_frac") == 0.0)
  }

  // --- gopherQuality ----------------------------------------------------

  test("gopherQuality: a clean long doc keeps; a short one does not") {
    val good = (("the good word list goes on and on here now " * 10).trim)
    val df = Seq((1L, good), (2L, "too short")).toDF("id", "text")
    val rows = QualityRules.gopherQuality(df, "id", "text")
      .orderBy("id").collect()
    assert(rows(0).getAs[Boolean]("keep"))
    assert(!rows(1).getAs[Boolean]("keep"))
    assert(rows(1).getAs[Long]("n_words") == 2)
  }

  test("gopherQuality: symbol ratio counts '#' and '...'") {
    val txt = "alpha # beta ... gamma ......"  // 1 hash + 3 ell groups
    val df = Seq((1L, txt)).toDF("id", "text")
    val r = QualityRules.gopherQuality(df, "id", "text").collect()(0)
    // tokens: alpha,#,beta,...,gamma,...... = 6 words; ell count = 9/3 = 3
    assert(r.getAs[Long]("n_words") == 6)
    assert(r.getAs[Double]("symbol_to_word") == (1.0 + 3.0) / 6)
  }

  test("gopherQuality: alpha-word fraction and stopword floor") {
    val df = Seq((1L, "123 456 789 0 x")).toDF("id", "text")
    val r = QualityRules.gopherQuality(df, "id", "text").collect()(0)
    assert(r.getAs[Double]("alpha_word_frac") == 0.2)
    assert(r.getAs[Long]("stopword_hits") == 0L)
    assert(!r.getAs[Boolean]("keep"))
  }

  test("gopherQuality plan is narrow (zero shuffles)") {
    val df = Seq((1L, "a b c")).toDF("id", "text")
    val p = QualityRules.gopherQuality(df, "id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), "gopherQuality must not shuffle")
  }

  // --- c4LineFilter -----------------------------------------------------

  test("c4LineFilter: drops blocklisted and short lines, gates on minLines") {
    val mk = (w: String) => Seq.fill(10)(w).mkString(" ")
    val keepDoc = Seq(mk("aa"), mk("bb"), mk("cc"), mk("bad")).mkString(" ")
    val dropDoc = Seq(mk("aa"), mk("bad"), mk("bad")).mkString(" ")
    val df = Seq((1L, keepDoc), (2L, dropDoc)).toDF("id", "text")
      .select(col("id"), graft.functions.TextFunctions.tokens(col("text"))
        .as("__toks"))
    val out = QualityRules.c4LineFilter(df, "id",
      QualityRules.syntheticLines(col("__toks"), 10),
      blocklist = Seq("bad"), minWordsPerLine = 5, minLines = 3)
    val rows = out.collect()
    assert(rows.length == 1 && rows(0).getAs[Long]("id") == 1L)
    assert(rows(0).getAs[Long]("n_lines_kept") == 3)
    assert(rows(0).getAs[String]("text_clean") ==
      Seq(mk("aa"), mk("bb"), mk("cc")).mkString("\n"))
  }

  test("c4LineFilter: short trailing line dropped by the word floor") {
    // 23 tokens → lines of 10/10/3; the 3-word tail fails minWordsPerLine
    val txt = (1 to 23).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, txt)).toDF("id", "text")
      .select(col("id"), graft.functions.TextFunctions.tokens(col("text"))
        .as("__toks"))
    val out = QualityRules.c4LineFilter(df, "id",
      QualityRules.syntheticLines(col("__toks"), 10),
      blocklist = Nil, minWordsPerLine = 5, minLines = 2)
    assert(out.collect()(0).getAs[Long]("n_lines_kept") == 2)
  }

  test("c4LineFilter: doubled spaces and tabs count real words, not split cells") {
    import spark.implicits._
    // "a  b  c" is 3 words (single-space split saw 5); the tab line is
    // 5 words (single-space split saw 1)
    val df = Seq((1L, Seq("a  b  c", "one\ttwo\tthree\tfour\tfive",
      "w1 w2 w3 w4 w5", "x1 x2 x3 x4 x5"))).toDF("id", "lines")
    val out = QualityRules.c4LineFilter(df, "id", col("lines"),
      blocklist = Nil, minWordsPerLine = 5, minLines = 1).collect()(0)
    assert(out.getAs[Long]("n_lines_kept") == 3L)
    assert(!out.getAs[String]("text_clean").contains("a  b  c"))
  }

  test("registrableDomain: trailing-dot FQDN form resolves like the plain host") {
    import spark.implicits._
    val urls = Seq("http://tracker.com./x", "http://a.b.co.uk./y",
      "http://plain.org/z").toDF("u")
    val got = urls.select(QualityRules.registrableDomain(col("u")))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("tracker.com", "b.co.uk", "plain.org"))
  }

  test("c4LineFilter plan is narrow (zero shuffles)") {
    val df = Seq((1L, "a b c")).toDF("id", "text")
      .select(col("id"), graft.functions.TextFunctions.tokens(col("text"))
        .as("__toks"))
    val p = QualityRules.c4LineFilter(df, "id",
      QualityRules.syntheticLines(col("__toks"), 10), Seq("x"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), "c4LineFilter must not shuffle")
  }

  // --- entropyScores ----------------------------------------------------

  test("entropyScores: single repeated char has zero char entropy") {
    val df = Seq((1L, "aaaa")).toDF("id", "text")
    val r = QualityRules.entropyScores(df, "id", "text").collect()(0)
    assert(r.getAs[Long]("n_chars_counted") == 4)
    assert(r.getAs[Double]("char_entropy") == 0.0)
    assert(r.getAs[Long]("n_tokens") == 1)
    assert(r.getAs[Double]("token_entropy") == 0.0)
  }

  test("entropyScores: uniform alphabet hits ln(k)") {
    val df = Seq((1L, "abcd")).toDF("id", "text")
    val r = QualityRules.entropyScores(df, "id", "text").collect()(0)
    assert(r.getAs[Double]("char_entropy") ==
      BigDecimal(math.log(4)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
  }

  test("entropyScores: token entropy distinguishes templated text") {
    val varied = "one two three four five six"
    val templated = "buy now buy now buy now"
    val df = Seq((1L, varied), (2L, templated)).toDF("id", "text")
    val m = QualityRules.entropyScores(df, "id", "text")
      .select("id", "token_entropy").as[(Long, Double)].collect().toMap
    assert(m(1L) > m(2L))
  }

  // --- dsirWeights ------------------------------------------------------

  test("dsirWeights: target-like docs score higher than off-target docs") {
    // target = lang en; en docs use one vocabulary, others a disjoint one
    val docs = (1 to 20).map { i =>
      if (i % 2 == 0) (i.toLong, "en", "alpha beta gamma delta")
      else (i.toLong, "zz", "omega sigma theta kappa")
    }.toDF("id", "lang", "text")
    val w = QualityRules.dsirWeights(docs, "id", "text",
      isTarget = col("lang") === "en", buckets = 1024)
      .join(docs.select(col("id"), col("lang")), "id")
      .groupBy("lang").agg(avg("dsir_weight").as("aw"))
      .as[(String, Double)].collect().toMap
    assert(w("en") > 0 && w("zz") < 0)
    assert(w("en") > w("zz"))
  }

  test("dsirWeights: empty docs get weight 0 and survive") {
    val docs = Seq((1L, "en", "some words here"), (2L, "zz", ""))
      .toDF("id", "lang", "text")
    val rows = QualityRules.dsirWeights(docs, "id", "text",
      isTarget = col("lang") === "en").orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(1).getAs[Long]("n_tokens") == 0L)
    assert(rows(1).getAs[Double]("dsir_weight") == 0.0)
  }

  test("dsirWeights: model join is a broadcast") {
    val docs = Seq((1L, "en", "a b c"), (2L, "zz", "d e f"))
      .toDF("id", "lang", "text")
    val p = QualityRules.dsirWeights(docs, "id", "text",
      isTarget = col("lang") === "en")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(600))
  }

  test("dsirWeights rejects non-power-of-two bucket counts") {
    val docs = Seq((1L, "en", "a")).toDF("id", "lang", "text")
    intercept[IllegalArgumentException] {
      QualityRules.dsirWeights(docs, "id", "text", lit(true), buckets = 1000)
    }
  }

  // --- plan-shape guards for the shuffling entries ----------------------

  test("gopherRepetition: pure per-row program — zero exchanges") {
    val df = Seq((1L, "a b c d e f")).toDF("id", "text")
    val p = QualityRules.gopherRepetition(df, "id", "text")
      .queryExecution.executedPlan.toString
    // r12 rewrite: the gram stats run as a per-row run-length scan over
    // the sorted gram array — nothing may shuffle, join, or explode
    assert("Exchange".r.findAllIn(p).isEmpty, p.take(800))
    assert(!p.contains("CartesianProduct"), "no cartesian in q139")
  }

  test("entropyScores: two explode-agg chains only") {
    val df = Seq((1L, "a b")).toDF("id", "text")
    val p = QualityRules.entropyScores(df, "id", "text")
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).size <= 7, p.take(800))
  }

  test("dsirWeights: the doc-bucket agg shuffles hashes, never text") {
    val df = Seq((1L, "en", "a b c")).toDF("id", "lang", "text")
    val plan = QualityRules.dsirWeights(df, "id", "text",
      isTarget = col("lang") === "en")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(600))
    // the only SortMergeJoin allowed is the final slim id-join
    assert("SortMergeJoin".r.findAllIn(plan).size <= 1, plan.take(800))
  }

  test("encodingAudit: per-group flags and exact non-ASCII ratio") {
    val df = Seq(
      ("s1", "clean ascii text"),
      ("s1", "bad \uFFFD here"),
      ("s1", "ctrl\u0001char"),
      ("s2", "moji \u00C3\u00A9 and \u00C2\u00A0"),
      ("s2", "caf\u00E9")).toDF("source", "text")
    val out = QualityRules.encodingAudit(df, "source", "text")
      .collect().map(r => r.getString(0) -> r).toMap
    val s1 = out("s1")
    assert(s1.getAs[Long]("n_docs") == 3L)
    assert(s1.getAs[Long]("n_replacement") == 1L)
    assert(s1.getAs[Long]("n_control") == 1L)
    assert(s1.getAs[Long]("n_mojibake") == 0L)
    // s1's only non-ASCII char is the U+FFFD itself
    assert(s1.getAs[Long]("n_nonascii_chars") == 1L)
    val s2 = out("s2")
    assert(s2.getAs[Long]("n_mojibake") == 1L) // doc with both markers counts once
    assert(s2.getAs[Long]("n_replacement") == 0L)
    // "moji Ã© and Â " has 4 non-ascii (Ã,©,Â,nbsp), "café" has 1
    assert(s2.getAs[Long]("n_nonascii_chars") == 5L)
  }

  test("encodingAudit: tab/newline/cr are NOT control anomalies") {
    val df = Seq(("s", "a\tb\nc\rd")).toDF("source", "text")
    val r = QualityRules.encodingAudit(df, "source", "text").collect().head
    assert(r.getAs[Long]("n_control") == 0L)
    assert(r.getAs[Double]("nonascii_rate") == 0.0)
  }

  test("registrableDomain: hostile URLs — ports, userinfo, case, garbage") {
    val cases = Seq(
      "https://www.example.com/a" -> "example.com",
      "https://www.example.co.uk:8080/x?q=1" -> "example.co.uk", // port stripped
      "http://user:pw@evil.com/x" -> "evil.com",                 // userinfo stripped
      "HTTPS://WWW.EXAMPLE.COM/A" -> "example.com",              // case-folded
      "http://cdn.ads.tracker-net.com/x" -> "tracker-net.com",   // deep subdomain
      "http://localhost:9000/" -> "localhost",                   // single label
      "not a url" -> null,                                       // no host
      "www.example.com/x" -> null)                               // scheme-less
    val df = cases.map(_._1).toDF("url")
      .select(col("url"), QualityRules.registrableDomain(col("url")).as("d"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    cases.foreach { case (u, want) => assert(df(u) == want, s"url=$u") }
  }

  test("domainCuration: blocklist gates keep, subdomains collapse") {
    // ~70 words, stopword-rich, clean → passes the Gopher gate
    val good = ("the quick brown fox jumps over the lazy dog near " +
      "the old stone bridge and the river bank today ") * 4
    val df = Seq(
      (1L, "https://www.shop.co.uk/a", good),
      (2L, "https://www.shop.co.uk:8080/b", "short text"), // fails Gopher
      (3L, "http://user:pw@cdn.ads.tracker-net.com/x", good), // blocked
      (4L, "http://localhost/x", good))
      .toDF("doc_id", "url", "text")
    val out = QualityRules.domainCuration(df, "doc_id", "url", "text",
        blocklist = Seq("tracker-net.com"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getBoolean(3), r.getLong(4), r.getDouble(5))).toMap
    assert(out("shop.co.uk") == ((2L, false, 1L, 0.5)))
    // good text on a blocked domain: counted, never kept
    assert(out("tracker-net.com") == ((1L, true, 0L, 0.0)))
    assert(out("localhost") == ((1L, false, 1L, 1.0)))
  }

  test("canonicalizeUrl: case/tracking/order/slash/fragment collapse; path case survives") {
    import org.apache.spark.sql.functions.col
    val urls = Seq(
      (1L, "HTTPS://Ex.COM/A/b?utm_source=x&z=1&a=2#frag"),
      (2L, "https://ex.com/A/b?a=2&z=1"),
      (3L, "https://ex.com/A/b/"),
      (4L, "https://ex.com/a/b"))
      .toDF("id", "url")
    val canon = urls.orderBy("id")
      .select(QualityRules.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0))
    assert(canon(0) == "https://ex.com/A/b?a=2&z=1", canon(0))
    assert(canon(1) == canon(0))
    assert(canon(2) == "https://ex.com/A/b")
    assert(canon(3) == "https://ex.com/a/b") // path case is significant
    val census = QualityRules.urlDupCensus(urls, "id", "url")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(census("https://ex.com/A/b?a=2&z=1") == ((2L, 2L, 1L)))
    assert(census("https://ex.com/A/b") == ((1L, 1L, 3L)))
  }

  // --- kAnonymityAudit ---------------------------------------------------

  test("kAnonymityAudit: hand-counted classes across thresholds") {
    // QI classes: (en,a)x3, (en,b)x1, (fr,a)x6 → sizes {3,1,6}
    val df = (Seq.fill(3)(("en", "a")) ++ Seq(("en", "b")) ++
      Seq.fill(6)(("fr", "a"))).toDF("lang", "source")
    val r = QualityRules.kAnonymityAudit(df,
        Seq(col("lang"), col("source")), thresholds = Seq(2, 4, 10))
      .collect().map(row => row.getAs[Int]("k") ->
        ((row.getAs[Long]("n_groups"), row.getAs[Long]("n_rows"),
          row.getAs[Long]("n_violating_groups"),
          row.getAs[Long]("n_rows_at_risk"),
          row.getAs[Double]("risk_share")))).toMap
    // k=2: only the size-1 class violates
    assert(r(2) == ((3L, 10L, 1L, 1L, 0.1)))
    // k=4: sizes 3 and 1 violate → 2 groups, 4 rows
    assert(r(4) == ((3L, 10L, 2L, 4L, 0.4)))
    // k=10: everything violates
    assert(r(10) == ((3L, 10L, 3L, 10L, 1.0)))
  }

  test("kAnonymityAudit: fully k-anonymous data reports zero risk") {
    val df = Seq.fill(5)(("en", 1)).toDF("lang", "v")
    val r = QualityRules.kAnonymityAudit(df, Seq(col("lang")),
      thresholds = Seq(2, 5)).collect()
    assert(r.forall(_.getAs[Long]("n_violating_groups") == 0L))
    assert(r.forall(_.getAs[Double]("risk_share") == 0.0))
  }

  test("watermarkScreen: hand-traced green pairs, z math, short-doc gating") {
    import graft.functions.HashUtil
    import org.apache.spark.unsafe.types.UTF8String
    // expected greens computed straight from the kernel's own FNV-64:
    // pair (a,b) green iff low bit of fnv64(a + 0x01 + b) is 0
    def green(a: String, b: String): Boolean =
      (HashUtil.fnv64(UTF8String.fromString(a + "\u0001" + b)) & 1L) == 0L
    val txt = "alpha beta gamma delta epsilon zeta"
    val toks = txt.split(" ").toSeq
    val expG = toks.sliding(2).count { case Seq(a, b) => green(a, b) }
    val df = Seq((1L, txt), (2L, "solo"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val rows = QualityRules.watermarkScreen(df, "doc_id", "text").collect()
    // <2-token and null docs emit nothing
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L))
    val r = rows(0)
    val m = toks.size - 1
    assert(r.getAs[Long]("m_pairs") == m.toLong)
    assert(r.getAs[Long]("g_green") == expG.toLong)
    assert(r.getAs[Double]("green_frac") == expG.toDouble / m)
    assert(r.getAs[Double]("z") == (2.0 * expG - m) / math.sqrt(m.toDouble))
    // tokenization is the lowercase kernel: case variants pair identically
    val up = QualityRules.watermarkScreen(
      Seq((9L, txt.toUpperCase)).toDF("doc_id", "text"), "doc_id", "text")
      .collect()(0)
    assert(up.getAs[Long]("g_green") == expG.toLong)
  }

  test("watermarkBySource: pooled integer sums, not per-doc z averaging") {
    val df = Seq(
      (1L, "a b c d", "s0"), (2L, "e f g", "s0"), (3L, "h i", "s1"))
      .toDF("doc_id", "text", "source")
    val per = QualityRules.watermarkScreen(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("m_pairs"), r.getAs[Long]("g_green"))).toMap
    val out = QualityRules.watermarkBySource(df, "doc_id", "text", "source")
      .collect().map(r => r.getString(0) -> r).toMap
    val (m0, g0) = (per(1L)._1 + per(2L)._1, per(1L)._2 + per(2L)._2)
    assert(out("s0").getAs[Long]("k_docs") == 2L)
    assert(out("s0").getAs[Long]("m_pairs") == m0)
    assert(out("s0").getAs[Long]("g_green") == g0)
    assert(out("s0").getAs[Double]("pooled_z") ==
      (2.0 * g0 - m0) / math.sqrt(m0.toDouble))
    assert(out("s1").getAs[Long]("m_pairs") == per(3L)._1)
  }

  test("trojanSourceAudit: each smuggling class caught by its counter") {
    import spark.implicits._
    val df = Seq(
      (1L, "plain ascii text"),
      (2L, "a\u202Exy\u202Cb\u2066z\u2069"),      // 4 bidi controls
      (3L, "pad\u200Bded\u200D plus bom \uFEFF"),  // 3 zero-width
      (4L, "bell\u0007 and esc\u001B"),             // 2 C0 controls
      (5L, "visit p\u0430ypal now"),     // Cyrillic homoglyph in word
      (6L, "\u0440\u0443\u0441\u0441\u043A\u0438\u0439 text"), // pure
      (7L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val out = QualityRules.trojanSourceAudit(df, "id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size == 6) // null text excluded
    assert(out(1L).getAs[Boolean]("clean"))
    assert(out(2L).getAs[Long]("n_bidi") == 4L)
    assert(!out(2L).getAs[Boolean]("clean"))
    assert(out(3L).getAs[Long]("n_zero_width") == 3L)
    assert(out(4L).getAs[Long]("n_control") == 2L)
    assert(out(5L).getAs[Boolean]("mixed_script"))
    // pure Cyrillic separated from Latin by a space is NOT mixed-script
    assert(!out(6L).getAs[Boolean]("mixed_script"))
    assert(out(6L).getAs[Boolean]("clean"))
  }
}
