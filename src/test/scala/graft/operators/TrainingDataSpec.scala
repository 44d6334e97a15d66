package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TrainingDataSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("deterministicSplit: buckets in range, fractions sane, hash-pure") {
    val docs = (0L until 2000L).toDF("id")
    val split = TrainingData.deterministicSplit(docs, "id", 90, 5)
      .select("id", "bucket", "split").collect()
    assert(split.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 100))
    val bySplit = split.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    // hash buckets are uniform-ish: 90/5/5 ±3 points on 2000 ids
    assert(math.abs(bySplit("train") / 2000.0 - 0.90) < 0.03)
    assert(math.abs(bySplit("val") / 2000.0 - 0.05) < 0.03)
    assert(math.abs(bySplit("test") / 2000.0 - 0.05) < 0.03)
  }

  test("deterministicSplit: a doc's split never changes when the corpus changes") {
    val full = TrainingData.deterministicSplit((0L until 1000L).toDF("id"), "id")
      .select("id", "split").as[(Long, String)].collect().toMap
    val subset = TrainingData.deterministicSplit(
      (0L until 1000L).filter(_ % 3 == 0).toDF("id"), "id")
      .select("id", "split").as[(Long, String)].collect().toMap
    subset.foreach { case (id, s) => assert(full(id) == s) }
  }

  test("packSequences: exact spans, straddling docs span chunks, capacity kept") {
    // one shard; token counts 100, 200, 50, 30: stream offsets
    // [0,100) [100,300) [300,350) [350,380); capacity 128 → chunk cuts at
    // 128, 256: doc 2 (100-300) overlaps chunks 0,1,2
    val docs = Seq((1L, 100), (2L, 200), (3L, 50), (4L, 30)).toDF("id", "n")
    val packed = TrainingData.packSequences(docs, "id", col("n"),
        capacity = 128, shard = lit(0L))
      .orderBy("chunk_id", "id")
      .select("chunk_id", "id", "tok_start", "tok_end")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(packed == Seq(
      (0L, 1L, 0L, 100L), (0L, 2L, 100L, 128L),
      (1L, 2L, 128L, 256L),
      (2L, 2L, 256L, 300L), (2L, 3L, 300L, 350L), (2L, 4L, 350L, 380L)))
    // no chunk ever exceeds capacity; spans are contiguous per chunk
    val byChunk = packed.groupBy(_._1).view.mapValues(_.map(t => t._4 - t._3).sum)
    assert(byChunk.values.forall(_ <= 128))
  }

  test("packSequences: shards pack independently and zero-token docs drop") {
    val docs = Seq((1L, 10, 0L), (2L, 0, 0L), (3L, 10, 1L)).toDF("id", "n", "s")
    val packed = TrainingData.packSequences(docs, "id", col("n"),
        capacity = 16, shard = col("s"))
      .select("shard", "chunk_id", "id", "tok_start")
      .as[(Long, Long, Long, Long)].collect().toSet
    // doc 2 (zero tokens) gone; both shards start their own stream at 0
    assert(packed == Set((0L, 0L, 1L, 0L), (1L, 0L, 3L, 0L)))
  }

  test("redactPii: all three kinds replaced, counts on pre-redaction text") {
    val df = Seq(
      (1L, "mail a.b-c%d@ex-1.co.uk or 555-123-4567 at 192.168.0.1 twice 1.2.3.4"),
      (2L, "clean text, no pii 12345")).toDF("id", "t")
    val out = TrainingData.redactPii(df, "t").orderBy("id")
      .select("n_email", "n_phone", "n_ipv4", "redacted")
      .as[(Int, Int, Int, String)].collect().toSeq
    assert(out(0) == ((1, 1, 2,
      "mail <EMAIL> or <PHONE> at <IP> twice <IP>")))
    assert(out(1) == ((0, 0, 0, "clean text, no pii 12345")))
  }

  test("redactPiiValidated: Luhn gates cards, mod-97 gates IBANs, plain digit runs survive") {
    val df = Seq(
      // valid card (4111... passes Luhn), spaced variant also valid
      (1L, "pay 4111111111111111 or 4111 1111 1111 1111 now"),
      // same-shape digit run failing Luhn: counted as nothing, NOT redacted
      (2L, "order id 4111111111111112 is not a card"),
      // valid IBAN (ISO example) + a one-digit mutation that must survive
      (3L, "send to GB82WEST12345698765432 not GB82WEST12345698765433"),
      // 16-digit timestamp-ish run, Luhn-invalid: untouched
      (4L, "ts 1234567890123456 end"),
      // too-short digit run: not even a candidate
      (5L, "pin 123456789012 end"))
      .toDF("id", "t")
    val out = TrainingData.redactPiiValidated(df, "t").orderBy("id")
      .select("n_ccard", "n_iban", "redacted")
      .as[(Int, Int, String)].collect().toSeq
    assert(out(0) == ((2, 0, "pay <CC> or <CC> now")))
    assert(out(1) == ((0, 0, "order id 4111111111111112 is not a card")))
    assert(out(2) == ((0, 1, "send to <IBAN> not GB82WEST12345698765433")))
    assert(out(3) == ((0, 0, "ts 1234567890123456 end")))
    assert(out(4) == ((0, 0, "pin 123456789012 end")))
  }

  test("redactPiiValidated: dashed card, DE IBAN, and regex kinds compose") {
    val df = Seq(
      (1L, "card 4111-1111-1111-1111 iban DE89370400440532013000 mail x@y.io"))
      .toDF("id", "t")
    val out = TrainingData.redactPiiValidated(df, "t")
      .select("n_email", "n_ccard", "n_iban", "redacted")
      .as[(Int, Int, Int, String)].collect().head
    assert(out == ((1, 1, 1, "card <CC> iban <IBAN> mail <EMAIL>")))
  }

  test("decontaminateSemantic: near-copy flagged, orthogonal text clean") {
    def vec(f: Int => Double): Array[Float] =
      (0 until 64).map(i => f(i).toFloat).toArray
    val evalSet = Seq((1000L, vec(i => if (i < 32) 1.0 else 0.0)))
      .toDF("vec_id", "embedding")
    val train = Seq(
      // tiny perturbation of the eval vector: cosine ≈ 1 → flagged
      (1L, vec(i => if (i < 32) 1.0 else if (i == 40) 0.01 else 0.0)),
      // supported on the complementary half: cosine 0 → clean
      (2L, vec(i => if (i >= 32) 1.0 else 0.0)))
      .toDF("vec_id", "embedding")
    val out = TrainingData.decontaminateSemantic(train, evalSet,
      threshold = 0.8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out.keySet == Set(1L))
    assert(out(1L)._1 == 1L && out(1L)._2 > 0.99 && out(1L)._3)
  }

  test("decontaminateSemanticServed: persisted-index gate == in-query; frozen append holds") {
    import graft.operators.Similarity
    def vec(seed: Long): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(64)((r.nextDouble() * 2 - 1).toFloat)
    }
    val train = (1L to 40L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val extra = (41L to 60L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    // eval vectors = perturbed copies of a few corpus vectors (so the
    // gate has true hits) + one fresh vector (so it has clean rows)
    val evalSet = (Seq(5L, 17L, 55L).map { i =>
      (1000L + i, vec(i).zipWithIndex.map { case (x, j) =>
        if (j == 0) x + 0.01f else x })
    } :+ ((2000L, vec(999L)))).toDF("vec_id", "embedding")
    val base = java.nio.file.Files.createTempDirectory("graft-decon-idx")
    val path = s"$base/idx"
    Similarity.writeLshIndex(train, path)
    Similarity.appendToLshIndex(extra, path) // frozen-plane growth
    val full = train.unionByName(extra)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3))).toSet
    val served = key(TrainingData.decontaminateSemanticServed(
      evalSet, path, threshold = 0.8))
    val inQuery = key(TrainingData.decontaminateSemantic(
      full, evalSet, threshold = 0.8))
    assert(served == inQuery && served.nonEmpty)
  }

  test("shardManifest: totals conserve; checksum invariant to row order and partitioning") {
    val docs = (1L to 200L).map(i =>
      (i, if (i % 7 == 0) null else s"doc $i body " + ("x " * (i % 5).toInt)))
      .toDF("id", "text")
    def manifest(df: org.apache.spark.sql.DataFrame) =
      TrainingData.shardManifest(df, "id", "text", nShards = 4)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)))))
        .toMap
    val m = manifest(docs)
    assert(m.values.map(_._1).sum == 200L) // every doc lands in a shard
    // null texts: 0 tokens / 0 bytes contributed, checksum skips them
    assert(m.values.map(_._2).sum ==
      (1L to 200L).filter(_ % 7 != 0).map(i => 3 + (i % 5)).sum)
    // the manifest is a pure function of content — not of order/layout
    assert(manifest(docs.orderBy(org.apache.spark.sql.functions.rand(7))
      .repartition(13)) == m)
  }

  test("stratifiedSample: per-stratum rates hold and are retry-stable") {
    val docs = (0L until 4000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "g")
    val kept = TrainingData.stratifiedSample(docs, "id", "g",
      rates = Map("a" -> 0.5, "b" -> 0.1))
      .select("id", "g").as[(Long, String)].collect()
    val byG = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(math.abs(byG("a") / 2000.0 - 0.5) < 0.05)
    assert(math.abs(byG("b") / 2000.0 - 0.1) < 0.05)
    // retry-stability: second run keeps the identical set
    val again = TrainingData.stratifiedSample(docs, "id", "g",
      rates = Map("a" -> 0.5, "b" -> 0.1)).select("id").as[Long].collect().toSet
    assert(kept.map(_._1).toSet == again)
  }

  test("stratifiedSample composes with deterministicSplit (same bucket hash)") {
    val docs = (0L until 1000L).toDF("id")
    val split = TrainingData.deterministicSplit(docs, "id", 90, 5)
    // 50% sample of everything = 50% sample of each split, exactly
    val sampled = TrainingData.stratifiedSample(
      split, "id", "split", rates = Map("train" -> 0.5, "val" -> 0.5, "test" -> 0.5))
      .select("id").as[Long].collect().toSet
    val direct = TrainingData.stratifiedSample(
      docs.withColumn("c", lit("x")), "id", "c", rates = Map("x" -> 0.5))
      .select("id").as[Long].collect().toSet
    assert(sampled == direct)
  }

  test("sampleExactK: exactly min(k, stratum size) rows, rerun- and partition-stable") {
    val docs = (0L until 300L).map(i => (i, s"s${i % 4}")).toDF("id", "g")
      .union(Seq((9999L, "tiny")).toDF("id", "g")) // stratum smaller than k
    val a = TrainingData.sampleExactK(docs, "id", "g", k = 10)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val counts = a.groupBy(_._2).view.mapValues(_.size).toMap
    assert(counts == Map("s0" -> 10, "s1" -> 10, "s2" -> 10, "s3" -> 10, "tiny" -> 1))
    // same sample regardless of partitioning or row order
    val b = TrainingData.sampleExactK(docs.repartition(13).orderBy(col("id").desc),
      "id", "g", k = 10)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)
  }

  test("chunkTokens: overlapping windows, truncated tail, empty docs dropped") {
    val toks = (1 to 10).map(i => s"w$i")
    val docs = Seq((1L, toks), (2L, Seq("only")), (3L, Seq.empty[String]))
      .toDF("doc_id", "toks")
    val got = TrainingData.chunkTokens(docs, "doc_id", col("toks"), size = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    val d1 = got.filter(_._1 == 1L).sortBy(_._2)
    // starts 0,3,6,9 → chunks w1-4, w4-7, w7-10, w10
    assert(d1.map(c => (c._3, c._4, c._5)).toSeq == Seq(
      (0, 4, "w1 w2 w3 w4"), (3, 4, "w4 w5 w6 w7"),
      (6, 4, "w7 w8 w9 w10"), (9, 1, "w10")))
    assert(got.filter(_._1 == 2L).toSeq == Seq((2L, 0, 0, 1, "only")))
    assert(!got.exists(_._1 == 3L))
  }

  test("leakageSafeSplit: every near-dup pair lands on one side") {
    // clusters {1,2,3} and {10,11}; 20 unpaired
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("id")
    val split = TrainingData.leakageSafeSplit(docs, pairs, "id", 50, 25)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(split.size == 6)
    assert(split(1L) == split(2L) && split(2L) == split(3L))
    assert(split(10L) == split(11L))
  }

  test("mixCorpora: weights hold, sources tagged, shuffle key deterministic") {
    val a = (0L until 1000L).toDF("id")
    val b = (0L until 1000L).toDF("id")
    val mixed = TrainingData.mixCorpora(
      Seq(("a", a, 1.0), ("b", b, 0.25)), "id")
      .select("source_name", "id", "shuffle_key")
      .as[(String, Long, Long)].collect()
    val byS = mixed.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byS("a") == 1000, "weight 1.0 must keep everything")
    assert(math.abs(byS("b") / 1000.0 - 0.25) < 0.05)
    // same id in different sources gets a DIFFERENT shuffle key (folded id)
    val keysA = mixed.filter(_._1 == "a").map(m => m._2 -> m._3).toMap
    val keysB = mixed.filter(_._1 == "b").map(m => m._2 -> m._3).toMap
    keysB.keys.take(50).foreach(id => assert(keysA(id) != keysB(id)))
    // rerun bit-identical
    val again = TrainingData.mixCorpora(Seq(("a", a, 1.0), ("b", b, 0.25)), "id")
      .select("source_name", "id", "shuffle_key")
      .as[(String, Long, Long)].collect()
    assert(mixed.sortBy(m => (m._1, m._2)).toSeq == again.sortBy(m => (m._1, m._2)).toSeq)
  }

  test("decontaminate: shared n-gram flags the doc, distinct hits counted") {
    val train = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "completely disjoint words here entirely"),
      (12L, "quick brown fox again and quick brown fox twice")).toDF("doc_id", "text")
    val eval = Seq((90L, "a quick brown fox appeared")).toDF("doc_id", "text")
    val out = TrainingData.decontaminate(train, eval, "doc_id", "text", n = 3)
      .select("id", "n_hits").as[(Long, Long)].collect().toMap
    // 'quick brown fox' is the only shared 3-gram; doc 12 repeats it but
    // hits count DISTINCT grams
    assert(out == Map(10L -> 1L, 12L -> 1L))
  }

  test("decontaminateBloom: identical output to the exact path, FPs reranked away") {
    val train = (0L until 200L).map { i =>
      val tail = if (i % 7 == 0) "shared marker phrase here" else s"unique filler $i words"
      (i, s"doc number $i begins $tail")
    }.toDF("doc_id", "text")
    val eval = Seq((900L, "the shared marker phrase here ends")).toDF("doc_id", "text")
    val exact = TrainingData.decontaminate(train, eval, "doc_id", "text", n = 3)
      .select("id", "n_hits").as[(Long, Long)].collect().toSortedSet
    // tiny bloom (high FP pressure) must still be exact after the rerank
    val bloom = TrainingData.decontaminateBloom(train, eval, "doc_id", "text",
      n = 3, expectedEvalGrams = 8, fpp = 0.3)
      .select("id", "n_hits").as[(Long, Long)].collect().toSortedSet
    assert(bloom == exact && exact.nonEmpty)
  }

  test("weightedSample: deterministic, partition-stable, weight-monotone") {
    val docs = (0L until 5000L).map(i => (i, 1.0 + (i % 100))).toDF("id", "w")
    val a = TrainingData.weightedSample(docs, "id", col("w"), 200)
      .select("id").as[Long].collect().toSortedSet
    val b = TrainingData.weightedSample(docs.repartition(17), "id", col("w"), 200)
      .select("id").as[Long].collect().toSortedSet
    assert(a == b && a.size == 200)
    // heavier rows win far more often than their share of the population:
    // ids with w >= 91 are 10% of rows; under ∝-weight sampling they carry
    // ~18% of total weight and should dominate well above 10% of the draw
    val heavy = a.count(id => id % 100 >= 90)
    assert(heavy > 200 * 0.13, s"heavy rows underrepresented: $heavy/200")
    // zero/negative weights never selected
    val withZero = TrainingData.weightedSample(
      docs.withColumn("w", when(col("id") < 4999, lit(0.0)).otherwise(col("w"))),
      "id", col("w"), 10)
      .select("id").as[Long].collect()
    assert(withZero.toSeq == Seq(4999L))
  }

  private implicit class ToSortedSet[T: Ordering](a: Array[T]) {
    def toSortedSet: Seq[T] = a.toSeq.sorted
  }

  test("mixtureAudit: exact shares, excess, and KL sign behavior") {
    val df = (Seq.fill(6)("en") ++ Seq.fill(2)("fr") ++ Seq.fill(2)("xx"))
      .zipWithIndex.map { case (l, i) => (i.toLong, l, "w w w") }
      .toDF("id", "lang", "text")
    val out = TrainingData.mixtureAudit(df, "lang", "text",
      Map("en" -> 0.5, "fr" -> 0.5))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("en").getAs[Double]("share") == 0.6)
    assert(out("en").getAs[Long]("tokens") == 18L)
    assert(out("en").getAs[Double]("excess") == 0.6 - 0.5)
    assert(out("en").getAs[Double]("kl_term") > 0)   // over-represented
    assert(out("fr").getAs[Double]("kl_term") < 0)   // under-represented
    assert(out("xx").getAs[Double]("target_share") == 0.0)
    assert(out("xx").isNullAt(out("xx").fieldIndex("kl_term")))
  }

  test("rankNormalize: quantile scaling with RANK tie semantics") {
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 20.0),
      ("a", 4L, 30.0), ("b", 5L, 99.0)).toDF("g", "id", "v")
    val out = TrainingData.rankNormalize(df, "g", "v")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("score_norm"))
      .toMap
    assert(out(1L) == 0.0)
    assert(out(2L) == 1.0 / 3 && out(3L) == 1.0 / 3)  // tie: shared min rank
    assert(out(4L) == 1.0)
    assert(out(5L) == 0.0)                            // singleton group
  }

  test("quantileNormalize: groups land on the pooled order statistics") {
    // pool = [1,2,3,4,10,20] (N=6)
    val df = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L), ("a", 4L, 4L),
      ("b", 5L, 10L), ("b", 6L, 20L)).toDF("g", "id", "v")
    val out = TrainingData.quantileNormalize(df, "g", "v")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("value_norm"))
      .toMap
    // group a (n=4): ranks 1..4 → pooled positions ceil(6k/4) = 2,3,5,6
    assert(out(1L) == 2L && out(2L) == 3L && out(3L) == 10L && out(4L) == 20L)
    // group b (n=2): positions 3, 6
    assert(out(5L) == 3L && out(6L) == 20L)
  }

  test("quantileNormalize: ties share the ≤-count rank") {
    val df = Seq(("a", 1L, 7L), ("a", 2L, 7L), ("b", 3L, 1L), ("b", 4L, 9L))
      .toDF("g", "id", "v")
    val out = TrainingData.quantileNormalize(df, "g", "v")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("value_norm"))
      .toMap
    // both 7s have c=2 of n=2 → pos 4 → pooled max 9
    assert(out(1L) == 9L && out(2L) == 9L)
    assert(out(3L) == 7L)   // c=1, n=2 → pos 2 → second-smallest of [1,7,7,9]
    assert(out(4L) == 9L)
  }

  test("negativeSample: cross-label only, deterministic, bucket-probed") {
    val df = (0L until 64L).map(i =>
      (i, if (i % 2 == 0) "a" else "b")).toDF("doc_id", "source")
    val out = TrainingData.negativeSample(df, "doc_id", "source",
      k = 3, buckets = 8)
    val rows = out.collect()
    val byId = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // every negative has a different label than its anchor
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(byId(r.getAs[Long]("doc_id")) != r.getAs[String]("neg_label"))
      assert(r.getAs[Long]("neg_id") != r.getAs[Long]("doc_id"))
    }
    // at most one negative per (anchor, probe round)
    val keys = rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("probe")))
    assert(keys.distinct.length == keys.length)
    // pure function of ids: a re-run (fresh plan) is bit-identical
    val again = TrainingData.negativeSample(df.repartition(7), "doc_id",
      "source", k = 3, buckets = 8).collect()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[Long]("probe"),
        r.getAs[Long]("neg_id"), r.getAs[String]("neg_label"))
    assert(rows.map(key).toSet == again.map(key).toSet)
  }

  test("crossSourceLeakage: shared identities per source pair, head fingerprint") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      ("a", "shared doc one"), ("a", "only in a"),
      ("b", "shared doc one"), ("b", "also only b"),
      ("c", "shared doc one"), ("c", "only in a"))  // c shares with a AND b
      .toDF("source", "text")
    val out = TrainingData.crossSourceLeakage(df, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_shared"), r.getAs[Double]("share_of_g1"))).toMap
    assert(out(("a", "b")) == (1L, 0.5))
    assert(out(("a", "c")) == (2L, 1.0)) // both of a's docs leak into c
    assert(out(("b", "c")) == (1L, 0.5))
    // prefix fingerprint: texts sharing the first 10 chars collide
    val px = Seq(("a", "same-head AAAA"), ("b", "same-head BBBB"))
      .toDF("source", "text")
    assert(TrainingData.crossSourceLeakage(px, "source", "text")
      .count() == 0) // full-text identity: no leak
    val hit = TrainingData.crossSourceLeakage(px, "source", "text",
      prefixChars = 9).collect()
    assert(hit.length == 1 && hit.head.getAs[Long]("n_shared") == 1L)
  }

  test("temperatureMixture: sqrt scaling compresses the head, boosts the tail") {
    // source a: 9 tokens, b: 1 token → raw 0.9/0.1; temp √9/(√9+√1)
    // = 0.75 and 0.25 → tail boosted 2.5×, head damped
    val df = Seq(("a", "t t t t t t t t t"), ("b", "t"))
      .toDF("source", "text")
    val out = TrainingData.temperatureMixture(df, "source", "text")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Long]("n_tokens") == 9L)
    assert(out("a").getAs[Double]("raw_share") == 0.9)
    assert(out("a").getAs[Double]("temp_share") == 0.75)
    assert(out("b").getAs[Double]("temp_share") == 0.25)
    assert(out("b").getAs[Double]("boost") == 2.5)
    assert(out("a").getAs[Double]("boost") < 1.0)
  }

  test("packBinsSummary: next-fit fold, oversize capping, padding math") {
    // id order 100,200,100,300(capped 256) at cap 256 -> each opens a
    // new bin (next-fit never revisits): 4 bins, packed 656 of 1024
    val df = Seq((1L, 100), (2L, 200), (3L, 100), (4L, 300))
      .toDF("doc_id", "n")
    val out = TrainingData.packBinsSummary(df, "doc_id", col("n"),
      capacity = 256, shard = lit(0)).head()
    assert(out.getAs[Long]("n_docs") == 4L)
    assert(out.getAs[Long]("total_tokens") == 700L)
    assert(out.getAs[Long]("packed_tokens") == 656L)
    assert(out.getAs[Long]("n_oversize") == 1L)
    assert(out.getAs[Long]("n_bins") == 4L)
    assert(out.getAs[Double]("padding_frac") == 0.3594) // 368/1024
    // snug fit: 128+128 share one bin
    val snug = Seq((1L, 128), (2L, 128)).toDF("doc_id", "n")
    val s2 = TrainingData.packBinsSummary(snug, "doc_id", col("n"),
      capacity = 256, shard = lit(0)).head()
    assert(s2.getAs[Long]("n_bins") == 1L)
    assert(s2.getAs[Double]("padding_frac") == 0.0)
  }

  test("tokenBudgetSelect: greedy quality-first prefix, exact cut") {
    // (id, tokens, quality): order by (q desc, id) = 3, 1, 4, 2, 5
    val docs = Seq(
      (1L, 100L, 0.9), (2L, 100L, 0.5), (3L, 100L, 0.95),
      (4L, 100L, 0.9), (5L, 100L, 0.1)).toDF("id", "n", "q")
    val out = TrainingData.tokenBudgetSelect(docs, "id", col("n"), col("q"),
      budget = 300L)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("cum_tokens"), r.getAs[Boolean]("selected"))).toMap
    assert(out(3L) == (100L, true))
    assert(out(1L) == (200L, true))  // id tiebreak inside the 0.9 bucket
    assert(out(4L) == (300L, true))
    assert(out(2L) == (400L, false))
    assert(out(5L) == (500L, false))
    // boundary INSIDE a quality bucket: all same q, cut by id order
    val flat = Seq((10L, 60L, 0.5), (11L, 60L, 0.5), (12L, 60L, 0.5))
      .toDF("id", "n", "q")
    val cut = TrainingData.tokenBudgetSelect(flat, "id", col("n"), col("q"),
      budget = 120L)
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("selected")).toMap
    assert(cut == Map(10L -> true, 11L -> true, 12L -> false))
    // zero-token and null-quality docs are excluded from the race
    val mixed = Seq((20L, 0L, 0.9), (21L, 50L, 0.9)).toDF("id", "n", "q")
    assert(TrainingData.tokenBudgetSelect(mixed, "id", col("n"), col("q"),
      budget = 100L).collect().map(_.getLong(0)).toSeq == Seq(21L))
  }

  test("decontaminateSweep: single-pass n-sweep, recall monotone non-increasing") {
    // doc i holds i doc-unique tokens, so the only gram matches are the
    // planted copies (even ids, uppercased — tokenization lowercases)
    val docs = (1 to 12).map(i =>
      (i.toLong, (1 to i).map(j => s"w${i}x$j").mkString(" ")))
      .toDF("doc_id", "text")
    val evalDf = docs.filter(col("doc_id") % 2 === 0)
      .select((col("doc_id") + 100L).as("doc_id"),
        upper(col("text")).as("text"))
    val ns = Seq(2, 4, 8)
    val f = TrainingData
      .decontaminateSweep(docs, evalDf, "doc_id", "text", ns)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    // gate n flags exactly the planted docs with >= n tokens
    for (n <- ns; i <- 1 to 12)
      assert(f.contains((i.toLong, n)) == (i % 2 == 0 && i >= n),
        s"doc $i at n=$n")
    // n_hits counts the doc's distinct n-grams (i − n + 1, all unique)
    assert(f((8L, 4)) == 5L && f((8L, 8)) == 1L)
    // recall vs the FIXED floor-2 truth: monotone non-increasing in n
    val planted = (2 to 12 by 2).filter(_ >= 2)
    val recalls = ns.map(n =>
      planted.count(i => f.contains((i.toLong, n))).toDouble / planted.size)
    assert(recalls == recalls.sorted.reverse, recalls.toString)
    assert(recalls.head == 1.0 && recalls.last < 1.0, recalls.toString)
  }

  test("mixtureRebalance: hand-traced rates, under-represented source keeps rate 1") {
    // tokens: a=600, b=300, c=100 (sum 1000); weights: a=1, b=1, c=2
    // shares: .6/.3/.1 vs targets .25/.25/.5
    // rel: a=.25/.6, b=.25/.3, c=.5/.1=5 (max) → rates a=1/12, b=1/6, c=1
    val df = Seq(
      ("a", 600L, 1L), ("b", 200L, 1L), ("b", 100L, 1L), ("c", 100L, 2L))
      .toDF("source", "tk", "w")
    val out = TrainingData.mixtureRebalance(df, "source", col("tk"), col("w"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("c").getAs[Double]("rate") == 1.0)
    assert(out("c").getAs[Long]("planned_tokens") == 100L)
    val relA = (1.0 / 4.0) / (600.0 / 1000.0)
    val relC = (2.0 / 4.0) / (100.0 / 1000.0)
    assert(out("a").getAs[Double]("rate") == relA / relC)
    assert(out("a").getAs[Long]("planned_tokens") ==
      math.floor(relA / relC * 600.0).toLong)
    assert(out("b").getAs[Long]("observed_tokens") == 300L)
    assert(out("b").getAs[Double]("observed_share") == 0.3)
    // planned mixture matches the target RATIOS (up to floor):
    // planned a : c = 50 : 100 = target .25 : .5
    assert(out("a").getAs[Long]("planned_tokens") == 50L)
    assert(out("b").getAs[Long]("planned_tokens") == 50L)
  }

  test("mixtureRebalance: fractional target weights (no long truncation)") {
    // weights 0.6/0.4 — a long cast would truncate both to 0 and emit
    // NaN shares; ratios must match the integer 3/2 form exactly
    val frac = Seq(("a", 600L, 0.6), ("b", 400L, 0.4))
      .toDF("source", "tk", "w")
    val ints = Seq(("a", 600L, 3L), ("b", 400L, 2L))
      .toDF("source", "tk", "w")
    val fo = TrainingData.mixtureRebalance(frac, "source", col("tk"), col("w"))
      .collect().map(r => r.getString(0) -> r).toMap
    val io = TrainingData.mixtureRebalance(ints, "source", col("tk"), col("w"))
      .collect().map(r => r.getString(0) -> r).toMap
    Seq("a", "b").foreach { s =>
      assert(!fo(s).getAs[Double]("target_share").isNaN)
      assert(math.abs(fo(s).getAs[Double]("rate") -
        io(s).getAs[Double]("rate")) < 1e-12)
      assert(fo(s).getAs[Long]("planned_tokens") ==
        io(s).getAs[Long]("planned_tokens"))
    }
  }

  test("snapshotDiff: presence from join sides, null content compares null-safe") {
    val o = Seq((1L, "x"), (2L, null.asInstanceOf[String]),
      (3L, null.asInstanceOf[String]), (4L, "gone")).toDF("id", "c")
    val n = Seq((1L, "x"), (2L, "now set"),
      (3L, null.asInstanceOf[String]), (5L, "fresh")).toDF("id", "c")
    val out = TrainingData.snapshotDiff(o, n, "id", "c")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // id 2: present in BOTH with null old content → changed (the
    // nullness-as-presence bug reported it as "added"); id 3:
    // null == null content → unchanged; id 4 removed despite any nulls
    assert(out == Map("unchanged" -> 2L, "changed" -> 1L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("rangeShardPlan: brute-force replay of sample ranks, boundaries, audit") {
    val n = 10000
    val keys = (0 until n).map(i => Tuple1((i.toLong * 7919) % 50021))
    val df = keys.toDF("k")
    val shards = 8
    val out = TrainingData.rangeShardPlan(df, "k", shards, sampleMod = 16)
      .collect().map(r => r.getInt(0) ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("k_min"),
          r.getAs[Long]("k_max"), r.getAs[Double]("skew"))).toMap
    // brute-force replay with Spark's own xxhash64 (collect the gate)
    val hashed = df.select(col("k"),
      pmod(xxhash64(col("k")), lit(16L)).as("h")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val sample = hashed.filter(_._2 == 0L).map(_._1).sorted
    val m = sample.length
    assert(m > shards, s"sample too small: $m")
    val bounds = (1 until shards)
      .map(i => sample(((i.toLong * m + shards - 1) / shards).toInt - 1))
      .sorted
    val exp = keys.map(_._1).groupBy(k => bounds.count(_ < k))
    assert(out.keySet == exp.keySet.map(_.toInt))
    for ((si, ks) <- exp) {
      val (nr, kmin, kmax, skew) = out(si)
      assert(nr == ks.size.toLong, s"shard $si rows")
      assert(kmin == ks.min && kmax == ks.max, s"shard $si range")
      assert(skew == nr.toDouble * shards / n, s"shard $si skew")
    }
    // realized shards cover all rows and are reasonably balanced here
    assert(out.values.map(_._1).sum == n.toLong)
    assert(out.values.map(_._4).max < 2.0, "pathological skew on uniform keys")
  }

  test("rangeShardPlan: boundary rows go LEFT; empty sample degenerates to one shard") {
    // keys all equal: every boundary equals the key, everything lands shard 0
    val df = (1 to 100).map(_ => Tuple1(5L)).toDF("k")
    val one = TrainingData.rangeShardPlan(df, "k", 4, sampleMod = 1).collect()
    assert(one.length == 1 && one(0).getInt(0) == 0 &&
      one(0).getAs[Long]("n_rows") == 100L)
    // sampleMod so large nothing samples: no boundaries, one shard out
    val tiny = (1 to 50).map(i => Tuple1(i.toLong)).toDF("k")
    val rows = TrainingData.rangeShardPlan(tiny, "k", 4,
      sampleMod = 1 << 30).collect()
    assert(rows.length == 1 && rows(0).getInt(0) == 0 &&
      rows(0).getAs[Long]("n_rows") == 50L)
  }

  test("decontaminateSemanticServed: wide 12-bit band keys — exact twins " +
      "always candidates; moderate-cosine recall is the documented trade") {
    import graft.operators.Similarity
    // planesPerBand is the corpus-growth selectivity lever (per-band
    // signatures, r12): buckets shrink 2^(p-4)× vs the default 4-bit
    // keys, and the recall cost concentrates at LOW cosine. This spec
    // pins the two ends of that trade at p=12:
    //   (a) an EXACT twin shares every per-band signature by
    //       construction, so candidate generation cannot miss it at any
    //       key width — recall 1.0, deterministically;
    //   (b) moderate-cosine (~0.85) contamination is where selectivity
    //       is bought: analytic hit rate 1-(1-(1-θ/π)^12)^15 ≈ 0.78.
    def vec(seed: Long): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(64)((r.nextDouble() * 2 - 1).toFloat)
    }
    val corpus = (1L to 300L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val base = java.nio.file.Files.createTempDirectory("graft-decon-wide")
    val path = s"$base/idx"
    Similarity.writeLshIndex(corpus, path, planesPerBand = 12)
    // (a) exact twins of 20 corpus vectors under fresh eval ids
    val exactEval = (1L to 20L).map(i => (1000L + i, vec(i)))
      .toDF("vec_id", "embedding")
    val flaggedExact = TrainingData.decontaminateSemanticServed(
      exactEval, path, threshold = 0.999)
      .select("id").as[Long].collect().toSet
    assert(flaggedExact == (1L to 20L).toSet)
    // (b) eval = corpus vector + 0.62× an independent random direction
    // (cosine ≈ 0.85 against its source; ≈ 0 against everything else)
    def mixed(i: Long): Array[Float] = {
      val c = vec(i); val r = vec(10000L + i)
      c.zip(r).map { case (a, b) => a + 0.62f * b }
    }
    val modEval = (21L to 60L).map(i => (2000L + i, mixed(i)))
      .toDF("vec_id", "embedding")
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    // driver-side exact truth: which mixed evals truly clear 0.8
    // against their source vector (other corpus vectors are random —
    // cosines ~0, far below threshold)
    val truth = (21L to 60L).filter(i => cos(mixed(i), vec(i)) >= 0.8).toSet
    assert(truth.size >= 20, s"fixture degenerate: ${truth.size}")
    val flaggedMod = TrainingData.decontaminateSemanticServed(
      modEval, path, threshold = 0.8)
      .select("id").as[Long].collect().toSet
    val recall = (flaggedMod intersect truth).size.toDouble / truth.size
    // measured 0.816 with these seeds (analytic expectation 0.78);
    // the floor leaves seed-robustness margin, the < 1.0 ceiling pins
    // that wide keys ARE lossy at moderate cosine — if this ever hits
    // 1.0 the banding (or fixture hardness) changed and the documented
    // trade needs re-deriving
    info(s"measured moderate-cosine recall: $recall (truth ${truth.size})")
    assert(recall >= 0.5 && recall < 1.0, s"recall=$recall")
    // no false flags: every flagged id is a genuinely contaminated one
    assert(flaggedMod.subsetOf(truth))
    // (c) multi-probe (probeFlips=1) buys the recall back WITHOUT
    // rebuilding: per-band hit rate rises p^12 → p^12 + 12·p^11(1−p)
    // (analytic ≈ 0.998 over 15 bands at cosine 0.85, vs 0.78 single-
    // probe) at 9/4096 candidate volume per band — still 28× below the
    // 4-bit default. The exact-cosine gate is unchanged, so the no-
    // false-flags property is preserved by construction.
    val flaggedMp = TrainingData.decontaminateSemanticServed(
      modEval, path, threshold = 0.8, probeFlips = 1)
      .select("id").as[Long].collect().toSet
    val recallMp = (flaggedMp intersect truth).size.toDouble / truth.size
    info(s"multi-probe moderate-cosine recall: $recallMp")
    assert(flaggedMod.subsetOf(flaggedMp),
      "multi-probe lost a single-probe catch (candidate superset broken)")
    assert(recallMp >= recall && recallMp >= 0.9, s"recallMp=$recallMp")
    assert(flaggedMp.subsetOf(truth))
  }
}
