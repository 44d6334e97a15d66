package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val good = "the quick brown fox jumps over the lazy dog and it runs to the river in the morning light today"

  private val docs = Seq(
    (0L, good, "en"),
    (1L, good, "en"),                                  // exact dup of 0
    (2L, good + " with one tiny change", "en"),        // near dup of 0
    (3L, "!!! ??? ;;; :::", "en"),                     // fails quality gate
    (4L, "short text", "en"),                          // fails min tokens
    (5L, good + " but in another language entirely", "zz"), // fails lang gate
    (6L, "the data engine runs large scale queries and it is fast to work with in most of the cases", "en")
  ).toDF("doc_id", "text", "lang")

  private val config = Curation.Config(
    allowedLangs = Some(Set("en", "fr", "de", "es", "zh")),
    minQuality = 0.3, minTokens = 5, nearDupJaccard = Some(0.5))

  test("curate: gates, exact dedup, near-dup removal, stable winners") {
    val kept = Curation.curate(docs, config).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept.contains(0L) && kept.contains(6L))
    assert(!kept.contains(1L), "exact dup survived")
    assert(!kept.contains(2L), "near dup survived")
    assert(!kept.contains(3L) && !kept.contains(4L) && !kept.contains(5L))
  }

  test("funnel counts are monotone and match the stages") {
    val f = Curation.funnel(docs, config)
    assert(f.input == 7)
    assert(f.afterLangGate == 6)       // doc 5 out
    assert(f.afterQualityGate == 4)    // docs 3, 4 out
    assert(f.afterExactDedup == 3)     // doc 1 merged into 0
    assert(f.afterNearDedup == 2)      // doc 2 merged into 0
  }

  test("funnel on the real documents table is monotone and non-degenerate") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val f = Curation.funnel(docs, config)
    assert(f.input == 500)
    assert(f.afterLangGate <= f.input && f.afterLangGate > 0)
    assert(f.afterQualityGate <= f.afterLangGate && f.afterQualityGate > 0)
    assert(f.afterExactDedup <= f.afterQualityGate && f.afterExactDedup > 0)
    assert(f.afterNearDedup <= f.afterExactDedup && f.afterNearDedup > 0)
    val curated = Curation.curate(docs, config)
    assert(curated.count() == f.afterNearDedup)
  }

  test("curated output carries token counts and quality scores") {
    val row = Curation.curate(docs, config)
      .filter($"doc_id" === 6L).head()
    assert(row.getAs[Int]("n_tokens") > 10)
    assert(row.getAs[Double]("quality_score") > 0.3)
  }

  test("datasheet: one-row corpus summary with exact dup census") {
    val df = Seq(
      ("a", "x y z"), ("a", "x y z"),      // exact dup pair
      ("b", "p q"), ("b", null))           // null text excluded from dups
      .toDF("source", "text")
    val r = Curation.datasheet(df, "source", "text").collect().head
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Long]("n_sources") == 2L)
    assert(r.getAs[Long]("n_null_text") == 1L)
    assert(r.getAs[Long]("n_tokens") == 8L)
    assert(r.getAs[Long]("n_vocab") == 5L)
    assert(r.getAs[Long]("n_exact_dups") == 1L)
    assert(r.getAs[Double]("dup_rate") == 0.3333)
    // doc token lengths 3,3,2 → median rank ⌈1.5⌉=2 → 3
    assert(r.getAs[Long]("p50_doc_tokens") == 3L)
  }
}
