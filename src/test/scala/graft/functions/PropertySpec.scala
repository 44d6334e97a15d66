package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.TestSpark
import graft.functions.CleanValue._

/** Property-based checks (SURVEY §5.2) using ScalaCheck generators:
  * totality of clean_value, dedup count identity, MinHash≈Jaccard,
  * SimHash locality.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("clean_value is total: any string → null or finite double") {
    val strings = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.asciiPrintableStr,
      Gen.chooseNum(-1e6, 1e6).map(d => f"$d%.3f"),
      Gen.chooseNum(-1e3, 1e3).map(d => s"${d.toString.replace('.', ',')} °F"),
      Gen.const(""), Gen.const("NaN"), Gen.const("∞"))
    val sample = Gen.listOfN(300, strings).sample.get
    val out = sample.toDF("v").select(cleanValue(col("v")).as("c")).collect()
    out.foreach { r =>
      if (!r.isNullAt(0)) {
        val d = r.getDouble(0)
        assert(!d.isNaN && !d.isInfinite)
      }
    }
  }

  test("sampleExactK: prefix property — the k-sample is contained in the (k+1)-sample") {
    // ranks are a pure function of id, so growing the budget only appends
    val ids = Gen.listOfN(400, Gen.chooseNum(0L, 100000L)).sample.get.distinct
    val df = ids.map(i => (i, s"g${i % 5}")).toDF("id", "g")
    val samples = Seq(3, 7, 12).map { k =>
      k -> graft.operators.TrainingData.sampleExactK(df, "id", "g", k)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    }.toMap
    assert(samples(3).subsetOf(samples(7)) && samples(7).subsetOf(samples(12)))
    // per-stratum sizes exactly min(k, stratum)
    val strata = ids.groupBy(i => s"g${i % 5}").view.mapValues(_.size).toMap
    samples.foreach { case (k, set) =>
      val bySize = set.groupBy(_._2).view.mapValues(_.size).toMap
      strata.foreach { case (g, n) =>
        assert(bySize.getOrElse(g, 0) == math.min(k, n), s"k=$k g=$g")
      }
    }
  }

  test("duplicate count identity: count - distinct == groupBy-excess for random frames") {
    val gen = Gen.listOfN(500, Gen.chooseNum(0, 50))
    val keys = gen.sample.get
    val df = keys.toDF("k")
    val viaDistinct = df.count() - df.select("k").distinct().count()
    val viaGroup = df.groupBy("k").count()
      .agg(sum(col("count") - 1)).head().getLong(0)
    assert(viaDistinct == viaGroup)
  }

  test("MinHash similarity estimate tracks exact Jaccard (±0.25 at 64 hashes)") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
      "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron", "pi")
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(20) {
      val base = rnd.shuffle(vocab).take(8 + rnd.nextInt(6)).toSet
      val mutated = base.filter(_ => rnd.nextDouble() > 0.3) ++
        rnd.shuffle(vocab).take(rnd.nextInt(4))
      (base.toSeq, mutated.toSeq)
    }
    val df = pairs.toDF("a", "b")
      .withColumn("sig_a", graft.functions.HashFunctions.minhash64(col("a"), 64))
      .withColumn("sig_b", graft.functions.HashFunctions.minhash64(col("b"), 64))
      .withColumn("est",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1.0).otherwise(0.0)), lit(0.0), _ + _) / 64.0)
      .withColumn("exact", graft.functions.TextFunctions.jaccard(col("a"), col("b")))
    df.select("est", "exact").collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 0.25,
        s"minhash est ${r.getDouble(0)} vs exact ${r.getDouble(1)}")
    }
  }

  test("SimHash locality: subset-perturbed token sets stay within hamming 24") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector.tabulate(40)(i => s"tok$i")
    Seq.fill(15) {
      val base = rnd.shuffle(vocab).take(25)
      val perturbed = base.drop(2) :+ "novel"
      (base, perturbed)
    }.toDF("a", "b")
      .select(graft.functions.HashFunctions.simhash64(col("a")).as("ha"),
        graft.functions.HashFunctions.simhash64(col("b")).as("hb"))
      .withColumn("d", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .collect().foreach { r =>
        assert(r.getAs[Int]("d") <= 24, s"hamming ${r.getAs[Int]("d")} too large")
      }
  }

  test("byte probes are total: arbitrary bytes → Some or None, never a throw") {
    // the safe-over-arbitrary-binary-corpora contract of every probe:
    // pure garbage, truncated real payloads, adversarial prefixes
    val garbage = Gen.listOfN(200,
      Gen.oneOf(
        Gen.listOfN(64, Gen.chooseNum(-128, 127)).map(_.map(_.toByte).toArray),
        Gen.listOfN(8, Gen.chooseNum(-128, 127)).map(_.map(_.toByte).toArray),
        Gen.const(Array.emptyByteArray))).sample.get
    // adversarial prefixes: real magics followed by junk, and real
    // payloads truncated at every prefix length
    val real = Seq(
      PngMeta.build(9, 7, 0, Some(("k", "v"))),
      Mp3Meta.build(30, 9, 1, 0, 3),
      AudioMeta.build(1, 8000, 16, 80),
      ExifMeta.build(littleEndian = true, orientation = 1, width = 10,
        height = 10, make = "m", datetime = "2024:01:01 00:00:00"))
    val truncs = real.flatMap(b => (0 to b.length by 7).map(b.take))
    val magicJunk = Seq("PNG", "ID3", "RIFF", "ÿØ")
      .map(_.getBytes("ISO-8859-1") ++ Array.fill(20)(0x41.toByte))
    // round-10 archive codecs join the same totality contract
    import graft.operators.Multimodal.{GzipCodec, TarCodec, ZipCodec, QtCodec, PdfCodec}
    val realArchives = Seq(
      ZipCodec.buildZip(Seq(("a", Array[Byte](1, 2)))),
      GzipCodec.buildGzip("n", 7L, Array[Byte](3, 4, 5)),
      TarCodec.buildTar(Seq(("f", Array[Byte](6)))),
      QtCodec.buildMov(16, 8, 25, Seq(Array[Byte](1)), brand = "isom",
        useCo64 = true, codec = "avc1"),
      PdfCodec.buildPdf(3, "fuzz"))
    val archTruncs = realArchives.flatMap(b => (0 to b.length by 11).map(b.take))
    val archJunk = Seq("PK", "PK", "",
      "ustar").map(_.getBytes("ISO-8859-1") ++ Array.fill(40)(0x42.toByte))
    (garbage ++ truncs ++ magicJunk ++ archTruncs ++ archJunk).foreach { bytes =>
      PngMeta.probe(bytes): Unit
      Mp3Meta.probe(bytes): Unit
      AudioMeta.probe(bytes): Unit
      ExifMeta.probe(bytes): Unit
      graft.functions.ContainerMeta.probe(bytes): Unit
      ZipCodec.parseZip(bytes): Unit
      GzipCodec.parseGzip(bytes): Unit
      TarCodec.parseTar(bytes): Unit
      QtCodec.parseMov(bytes): Unit
      PdfCodec.parsePdf(bytes): Unit
    }
    // and the intact payloads still parse
    assert(PngMeta.probe(real(0)).nonEmpty)
    assert(Mp3Meta.probe(real(1)).nonEmpty)
    assert(AudioMeta.probe(real(2)).nonEmpty)
    assert(ExifMeta.probe(real(3)).nonEmpty)
    assert(ZipCodec.parseZip(realArchives(0)).nonEmpty)
    assert(GzipCodec.parseGzip(realArchives(1)).nonEmpty)
    assert(TarCodec.parseTar(realArchives(2)).nonEmpty)
    assert(QtCodec.parseMov(realArchives(3)).nonEmpty)
    assert(PdfCodec.parsePdf(realArchives(4)).nonEmpty)
  }
}
