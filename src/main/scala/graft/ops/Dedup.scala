package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextKernels._

/** [EXT] Deduplication operators over a document corpus (SURVEY.md §7.1
  * step 6; generalizes the reference's keyed keep-latest dedup,
  * /root/reference/lib/connections/redshift.js:400-413, from key
  * equality to content equality and near-equality).
  *
  * Scale notes (100 TB):
  *  - `exact` shuffles once on a 128-bit content hash — uniformly
  *    distributed, so no skew; AQE coalesces the post-agg partitions.
  *  - `minhashCandidatePairs` computes signatures map-side, then
  *    shuffles only (band_idx, band_key) pairs; bucket sizes are the
  *    only join blow-up risk, controlled by band count / rows-per-band
  *    (more rows per band → higher precision → smaller buckets).
  *  - `jaccardPairs` is an inverted-index self-join on the shingle —
  *    the standard Spark near-dup verifier; never an all-pairs product.
  */
object Dedup {

  /** Exact content dedup: one row per distinct content hash with the
    * surviving (minimum) id and the number of copies collapsed.
    */
  def exact(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(md5(col(contentCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash + LSH banding candidate pairs: docs sharing ANY band key.
    * numHashes = bands * rowsPerBand signature entries.
    */
  def minhashCandidatePairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleWords: Int = 3, bands: Int = 4, rowsPerBand: Int = 4): DataFrame = {
    val sig = df.select(
      col(idCol),
      minhashSig(wordShingles(tokens(col(textCol)), shingleWords), bands * rowsPerBand).as("sig"))
    val bandRows = sig
      .select(col(idCol), posexplode(lshBandKeys(col("sig"), bands, rowsPerBand)).as(Seq("band_idx", "band_key")))
    bandRows.as("x")
      .join(bandRows.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_key") === col("y.band_key") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("doc_a"), col(s"y.$idCol").as("doc_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard similarity for pairs sharing ≥1 shingle,
    * via inverted-index self-join; emits pairs with jaccard ≥ threshold.
    */
  def jaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleWords: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = df.select(col(idCol), wordShingles(tokens(col(textCol)), shingleWords).as("s"))
    val inv = sh.select(col(idCol), size(col("s")).as("n"), explode(col("s")).as("g"))
    inv.as("x")
      .join(inv.as("y"), col("x.g") === col("y.g") && col(s"x.$idCol") < col(s"y.$idCol"))
      .groupBy(col(s"x.$idCol").as("doc_a"), col(s"y.$idCol").as("doc_b"))
      .agg(count(lit(1)).as("inter"), min(col("x.n")).as("na"), min(col("y.n")).as("nb"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** 60-bit SimHash per document (near-dup docs differ in few bits;
    * pair generation would bucket on a simhash prefix — same banding
    * idea as minhash).
    */
  def simhashes(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), tokenHashes(tokens(col(textCol))).as("hs"))
      .select(col(idCol), simhash60(col("hs")).as("simhash"))

  /** Rolling polynomial fingerprint per document (cheap pre-filter:
    * equal fingerprints → verify with `jaccardPairs`).
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), rollingFingerprint(tokens(col(textCol))).as("fingerprint"))
}
