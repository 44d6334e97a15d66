package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.TextFunctions._
import graft.functions.HashFunctions._

/** Deduplication operators for the large-scale training-data pipeline.
  *
  * Scale notes (the whole point of these designs):
  *  - exact dedup is one hash-shuffle on the group key; at 100 TB group on
  *    a 64-bit content hash, not the full text, so shuffle rows are ~16 B
  *    of key instead of whole documents.
  *  - MinHash/LSH avoids the O(n²) pair space: candidates only form within
  *    (band, bucket) groups, so the self-join is bucket-local. The band
  *    explode multiplies rows by #bands (constant), never by n.
  *  - SimHash candidates form within 16-bit band buckets of the 64-bit
  *    signature (pigeonhole: hamming ≤ 3 ⇒ at least one of 4 bands equal).
  */
object Dedup {

  /** Exact dedup on explicit keys (built-in shuffle dedup). */
  def exact(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** Exact content dedup keeping the smallest id per content group —
    * deterministic, oracle-friendly (unlike dropDuplicates' arbitrary
    * winner). Groups on a content hash so only (hash, id) rows shuffle;
    * at 100 TB this is the difference between shuffling 16 B and 1 MB/row.
    */
  def exactByContent(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.groupBy(xxhash64(col(contentCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("copies"))

  /** Same dedup keyed on the raw content value (oracle-expressible in plain
    * SQL; prefer [[exactByContent]] at scale — it shuffles hashes, not
    * documents).
    */
  def exactGroupsByValue(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.groupBy(col(contentCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("copies"))
      .select("keep_id", "copies")

  /** MinHash+LSH near-duplicate candidate pairs with exact-Jaccard rerank.
    *
    * shingle(k words) → minhash signature(numHashes) → band keys → bucket
    * self-join (a.id < b.id) → distinct pairs → exact Jaccard on shingle
    * sets → threshold filter. The exact rerank runs only on candidates, so
    * the expensive part is proportional to true near-dup density.
    */
  def minHashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 16, numBands: Int = 4,
      jaccardThreshold: Double = 0.5): DataFrame = {
    val rowsPerBand = numHashes / numBands
    val prepared = df.select(
      col(idCol).as("id"),
      wordShingles(col(textCol), shingleSize).as("shingles"))
      .filter(size(col("shingles")) > 0)
      .withColumn("sig", minHashSignature(col("shingles"), numHashes))
    val banded = prepared.select(
      col("id"), col("shingles"),
      explode(lshBandKeys(col("sig"), numBands, rowsPerBand)).as("bk"))
    val a = banded.select(col("bk"), col("id").as("id_a"), col("shingles").as("sh_a"))
    val b = banded.select(col("bk"), col("id").as("id_b"), col("shingles").as("sh_b"))
    a.join(b, Seq("bk"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").dropDuplicates("id_a", "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= jaccardThreshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash signatures for a text column (tokens → 64-bit signature). */
  def simHashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), simhash64(tokens(col(textCol))).as("simhash"))

  /** SimHash near-dup pairs within `maxHamming` (banded self-join: split the
    * 64-bit signature into 16-bit bands; hamming ≤ 3 guarantees a shared
    * band, so candidates form only inside band-value buckets).
    */
  def simHashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4×16-bit banding guarantees recall only for hamming <= 3")
    val sigs = simHashSignatures(df, idCol, textCol)
    val banded = sigs.select(col("id"), col("simhash"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL)).as("bits"))
      }: _*)).as("bk"))
    val a = banded.select(col("bk"), col("id").as("id_a"), col("simhash").as("sig_a"))
    val b = banded.select(col("bk"), col("id").as("id_b"), col("simhash").as("sig_b"))
    a.join(b, Seq("bk"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b").dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hammingDistance64(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Exact n-gram Jaccard similarity for all candidate pairs sharing at
    * least one character n-gram MinHash bucket (cheap LSH over char
    * n-grams instead of word shingles — catches near-dups that reorder
    * words less but edit characters).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 5, threshold: Double = 0.5,
      numHashes: Int = 12, numBands: Int = 4): DataFrame = {
    val rowsPerBand = numHashes / numBands
    val prepared = df.select(col(idCol).as("id"),
      array_distinct(charNgrams(lower(col(textCol)), n)).as("grams"))
      .filter(size(col("grams")) > 0)
      .withColumn("sig", minHashSignature(col("grams"), numHashes))
    val banded = prepared.select(col("id"), col("grams"),
      explode(lshBandKeys(col("sig"), numBands, rowsPerBand)).as("bk"))
    val a = banded.select(col("bk"), col("id").as("id_a"), col("grams").as("g_a"))
    val b = banded.select(col("bk"), col("id").as("id_b"), col("grams").as("g_b"))
    a.join(b, Seq("bk"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "g_a", "g_b").dropDuplicates("id_a", "id_b")
      .withColumn("jaccard", jaccard(col("g_a"), col("g_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Window-dedup: keep first row per key by order — the idiomatic upgrade
    * of the reference's duplicated(keep='first') semantics (SURVEY §2.F).
    */
  def keepFirst(df: DataFrame, keys: Seq[String], orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}
