package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("upsert: latest-wins merge by key, update beats existing on tie") {
    val dir = java.nio.file.Files.createTempDirectory("graft-upsert")
    val sink = new ParquetSink(dir.resolve("t").toString)
    sink.overwrite(Seq((1L, "old-a", 10L), (2L, "old-b", 10L)).toDF("k", "v", "ver"))
    val n = sink.upsert(
      Seq((2L, "new-b", 20L),   // newer version wins
        (3L, "new-c", 5L),      // new key inserted
        (1L, "tie-a", 10L))     // same version: update wins the tie
        .toDF("k", "v", "ver"),
      keys = Seq("k"), orderCol = "ver")
    assert(n == 3)
    val got = sink.read(spark).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "tie-a", 2L -> "new-b", 3L -> "new-c"))
  }

  test("upsert preserves the sink's partition layout (inside the published version)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-upsert-part")
    val root = dir.resolve("t").toString
    val sink = new ParquetSink(root, partitionBy = Seq("p"))
    sink.overwrite(Seq((1L, "a", "x"), (2L, "b", "y")).toDF("k", "v", "p"))
    sink.upsert(Seq((3L, "c", "y"), (1L, "a2", "x")).toDF("k", "v", "p"),
      keys = Seq("k"), orderCol = "k")
    val st = ManifestCommit.current(spark, root).getOrElse(fail("no manifest published"))
    val subdirs = new java.io.File(root, st.dataDir)
      .listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(subdirs == Set("p=x", "p=y"), s"partition layout lost: $subdirs")
    assert(sink.read(spark).count() == 3)
  }

  test("upsert into an empty sink behaves like overwrite") {
    val dir = java.nio.file.Files.createTempDirectory("graft-upsert-empty")
    val sink = new ParquetSink(dir.resolve("t").toString)
    val n = sink.upsert(Seq((1L, "a", 1L)).toDF("k", "v", "ver"), Seq("k"), "ver")
    assert(n == 1)
  }

  test("compact reduces file count, preserves rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact")
    val root = dir.resolve("t").toString
    val sink = new ParquetSink(root)
    sink.overwrite(spark.range(1000).toDF("id").repartition(16))
    val before = new java.io.File(root).listFiles()
      .count(_.getName.endsWith(".parquet"))
    val n = sink.compact(spark, targetFiles = 2)
    val cur = ManifestCommit.current(spark, root).getOrElse(fail("no manifest")).dataDir
    val after = new java.io.File(root, cur).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(n == 1000 && before >= 16 && after <= 2, s"$before -> $after")
  }

  test("manifest commit: crash after stage, before publish — old data stays current") {
    val dir = java.nio.file.Files.createTempDirectory("graft-manifest-crash1")
    val root = dir.resolve("t").toString
    val sink = new ParquetSink(root)
    sink.upsert(Seq((1L, "a", 1L)).toDF("k", "v", "ver"), Seq("k"), "ver")
    val v1 = ManifestCommit.current(spark, root).get
    // simulate a commit that died between STAGE and PUBLISH: a fully
    // written version dir that no manifest references
    val orphan = new java.io.File(root, "v99999-deadbeef")
    Seq((9L, "never-visible", 9L)).toDF("k", "v", "ver")
      .write.parquet(orphan.toString)
    // readers resolve the manifest, never the newest directory
    assert(ManifestCommit.current(spark, root).get == v1)
    assert(sink.read(spark).collect().map(_.getString(1)).toSeq == Seq("a"))
    // the next successful commit garbage-collects the orphan
    sink.upsert(Seq((2L, "b", 2L)).toDF("k", "v", "ver"), Seq("k"), "ver")
    assert(!orphan.exists(), "crashed-commit orphan not GC'd")
    assert(sink.read(spark).count() == 2)
  }

  test("manifest commit: publish is the commit point; superseded versions are GC'd") {
    val dir = java.nio.file.Files.createTempDirectory("graft-manifest-gc")
    val root = dir.resolve("t").toString
    val sink = new ParquetSink(root)
    sink.overwrite(Seq((1L, "a", 1L)).toDF("k", "v", "ver")) // plain layout
    sink.upsert(Seq((2L, "b", 2L)).toDF("k", "v", "ver"), Seq("k"), "ver")
    val first = ManifestCommit.current(spark, root).get
    assert(first.version == 1L && first.rows == 2L)
    // pre-manifest plain-layout files at the root were GC'd post-commit
    assert(!new java.io.File(root).listFiles().exists(f =>
      f.isFile && f.getName.endsWith(".parquet")), "stale plain files")
    sink.upsert(Seq((3L, "c", 3L)).toDF("k", "v", "ver"), Seq("k"), "ver")
    val second = ManifestCommit.current(spark, root).get
    assert(second.version == 2L && second.dataDir != first.dataDir)
    assert(!new java.io.File(root, first.dataDir).exists(),
      "superseded version dir not GC'd")
    assert(sink.read(spark).count() == 3)
    assert(sink.verifyCount(spark, 3L))
  }

  test("manifest commit: corrupt manifest is a typed hard error, not silent fallback") {
    val dir = java.nio.file.Files.createTempDirectory("graft-manifest-bad")
    val root = dir.resolve("t").toString
    val sink = new ParquetSink(root)
    sink.upsert(Seq((1L, "a", 1L)).toDF("k", "v", "ver"), Seq("k"), "ver")
    java.nio.file.Files.write(dir.resolve("t").resolve("_MANIFEST"),
      "not json".getBytes("UTF-8"))
    intercept[java.io.IOException] { sink.read(spark) }
  }

  test("csv, json and orc sinks round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sinks")
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    assert(new CsvSink(dir.resolve("csv").toString).overwrite(df) == 2)
    assert(new JsonSink(dir.resolve("json").toString).overwrite(df) == 2)
    val orc = new OrcSink(dir.resolve("orc").toString)
    assert(orc.overwrite(df) == 2)
    assert(orc.read(spark).collect().map(_.getString(1)).sorted.toSeq == Seq("a", "b"))
  }

  test("document-store sink: full truncate/insert/count protocol") {
    val dir = java.nio.file.Files.createTempDirectory("graft-docstore")
    val sink = new DocumentStoreSink(dir.resolve("donnees_horaires").toString)
    // protocol verbs individually (the etl_meteo.py:182-218 sequence)
    sink.ping()
    assert(sink.countDocuments(spark) == 0L)           // empty collection
    assert(sink.insertMany(Seq((1L, "a"), (2L, "b")).toDF("k", "v")) == 2L)
    assert(sink.insertMany(Seq((3L, "c")).toDF("k", "v")) == 1L) // append batch
    assert(sink.countDocuments(spark) == 3L)
    assert(sink.deleteMany(spark) == 3L)               // delete_many({})
    assert(sink.countDocuments(spark) == 0L)
    // overwrite() = ping -> truncate -> insert -> count-reconcile
    val df = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    assert(sink.overwrite(df) == 2L)
    assert(sink.overwrite(df) == 2L)                   // idempotent, not append
    assert(sink.read(spark).collect().map(_.getString(1)).sorted.toSeq == Seq("x", "y"))
  }

  test("empty-source overwrite reconciles as 0 rows (no schema-inference crash)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty-ovw")
    val empty = Seq((1L, "a")).toDF("k", "v").filter("k < 0")
    val doc = new DocumentStoreSink(dir.resolve("doc").toString)
    assert(doc.overwrite(Seq((1L, "a")).toDF("k", "v")) == 1L)
    // an upstream filter keeping 0 docs is a NORMAL outcome: the old
    // data is gone (truncate-and-load contract) and the count must be
    // 0, not UNABLE_TO_INFER_SCHEMA after the truncate already ran
    assert(doc.overwrite(empty) == 0L)
    assert(doc.countDocuments(spark) == 0L)
    assert(new JsonSink(dir.resolve("json").toString).overwrite(empty) == 0L)
  }

  test("csv sink: quoted embedded newlines reconcile as one record") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv-nl")
    val sink = new CsvSink(dir.resolve("c").toString)
    val df = Seq((1L, "line1\nline2"), (2L, "plain")).toDF("k", "v")
    // the writer quotes the embedded newline; a read-back without the
    // writer's sep/multiLine dialect split it into a phantom 3rd row
    assert(sink.overwrite(df) == 2L)
    assert(sink.read(spark).count() == 2L)
  }

  test("document-store sink: unreachable storage raises the typed connection failure") {
    val sink = new DocumentStoreSink("/nonexistent-root-dir/sub/collection")
    intercept[SinkConnectionFailure] { sink.ping() }
    intercept[SinkConnectionFailure] {
      sink.overwrite(Seq((1L, "a")).toDF("k", "v"))
    }
  }

  test("MongoSink: the connector seam compiles against the Sink trait; " +
      "absent connector surfaces as the typed connection failure") {
    val sink: Sink = new MongoSink("mongodb://localhost:27017", "meteo",
      "donnees_horaires")
    // no mongo-spark-connector jar in this sandbox: the DSv2 format
    // lookup fails, and ping maps that to SinkConnectionFailure — the
    // same typed path the reference reserves for ConnectionFailure
    intercept[SinkConnectionFailure] {
      sink.asInstanceOf[MongoSink].ping(spark)
    }
  }

  test("xml source round-trips (Spark 4 built-in XML)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xml")
    val df = Seq((1L, "alpha"), (2L, "beta")).toDF("k", "v")
    df.write.option("rootTag", "rows").option("rowTag", "row")
      .mode("overwrite").xml(dir.resolve("x").toString)
    val back = spark.read.option("rowTag", "row").xml(dir.resolve("x").toString)
    assert(back.count() == 2)
    assert(back.select("v").collect().map(_.getString(0)).sorted.toSeq == Seq("alpha", "beta"))
  }
}
