package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Kernels

/** [EXT] Multimodal column support: media payloads travel as opaque
  * `binary` columns plus a typed metadata struct; decode / feature
  * extraction is map-side only, so one task never holds more than a
  * partition of payloads.
  *
  * The decode kernel itself is a STUB (no image/audio codecs in this
  * environment): [[Kernels.mediaFeatures]]/[[Kernels.poolBytes]] derive
  * deterministic outputs from the payload bytes. The Spark-side
  * plumbing — schema, compiled StaticInvoke call inside
  * WholeStageCodegen, payload column pruning — is real and tested
  * (graft.PipelineSpec, graft.KernelParitySpec); a real deployment
  * swaps the kernel body for a codec call. Only a JNI/ONNX boundary
  * that needs batched handoff would justify mapPartitions instead —
  * that breaks codegen and column pruning (DeserializeToObject).
  *
  * Scale notes: payloads never pass through a shuffle here — metadata
  * extraction and feature extraction are map-side; downstream joins
  * should carry only (id, features, meta) and re-join payloads by id
  * when materially needed.
  */
object Multimodal {

  val FeatureDim = 8

  /** Attach a payload (bytes) + metadata struct to any DataFrame with a
    * string content column — the ingest shape a real pipeline would get
    * from `spark.read.format("binaryFile")`.
    */
  def ingest(df: DataFrame, idCol: String, contentCol: String, mediaType: String): DataFrame =
    df.select(
      col(idCol),
      col(contentCol).cast("binary").as("payload"),
      struct(
        lit(mediaType).as("media_type"),
        octet_length(col(contentCol).cast("binary")).cast("long").as("byte_len"),
        sha2(col(contentCol).cast("binary"), 256).as("sha256")).as("meta"))

  /** Feature extraction over binary payloads, map-side: the scan reads
    * only (idCol, payload). The decode step goes through the
    * [[MediaDecoder]] SPI — default [[StubDecoder]] plans the compiled
    * StaticInvoke kernel ([[Kernels.mediaFeatures]]); a registered
    * real codec ([[MediaDecoders.register]]) plans a codegen Invoke on
    * the shipped instance, same schema and pruning.
    */
  def extractFeatures(df: DataFrame, idCol: String,
      decoder: MediaDecoder = StubDecoder): DataFrame =
    df.select(col(idCol),
      MediaDecoders.featureCol(decoder, col("payload"), FeatureDim).as("features"))

  /** Frame sampling over binary payloads: split each payload into
    * fixed-size byte frames, one output row per frame — the shape a
    * video/audio pipeline needs before per-frame decoding (which would
    * run as `extractFeatures` over the frame column). Pure map-side:
    * slicing + explode, no shuffle; payload bytes never leave the
    * task that read them.
    */
  def frames(df: DataFrame, idCol: String, frameBytes: Int): DataFrame = {
    // fail fast at the driver: frameBytes = 0 would make nFrames
    // Infinity → Int.MaxValue and blow up sequence() deep inside a job
    require(frameBytes > 0, s"frame size must be positive, got $frameBytes")
    val nFrames = greatest(
      ceil(octet_length(col("payload")).cast("double") / frameBytes).cast("int"),
      lit(1))
    df.select(
      col(idCol),
      posexplode(transform(sequence(lit(0), nFrames - 1),
        i => col("payload").substr(i * frameBytes + 1, lit(frameBytes))))
        .as(Seq("frame_idx", "frame")))
  }

  /** Resize (downsample) binary payloads by average-pooling windows of
    * `factor` bytes — the deterministic stand-in for an image/audio
    * resample (a real deployment swaps the pooling loop for the codec's
    * scaler; the partition-wise batch shape, pruned columns, and output
    * schema are what it would use). Integer window mean (floor) keeps
    * the result exact and engine-portable. Map-side only — payloads
    * never shuffle.
    *
    * Output: (idCol, resized: array<long>) — one pooled value per
    * window, ceil(len/factor) windows, empty payloads give an empty
    * array. Compiled StaticInvoke kernel ([[Kernels.poolBytes]]),
    * map-side, codegen'd, payload column pruned.
    */
  def resize(df: DataFrame, idCol: String, factor: Int,
      decoder: MediaDecoder = StubDecoder): DataFrame = {
    require(factor > 0, "factor must be positive")
    df.select(col(idCol),
      MediaDecoders.resizeCol(decoder, col("payload"), factor).as("resized"))
  }

  /** Perceptual hashes per payload: the 60-bit gradient dHash analogue
    * ([[Kernels.dhash60]]) — map-side, codegen'd, payload pruned to
    * (idCol, payload). Near-identical media (same content re-encoded,
    * cropped padding, minor noise under a real decoder; byte-edits
    * under the stub) land within a few bits.
    */
  def phashes(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol), Kernels.dhash60Of(col("payload")).as("phash"))

  /** Perceptual near-dup pairs: bucket the 60-bit dHash into 4×15-bit
    * bands (pairs with hamming < 4 necessarily agree on ≥1 band — the
    * banding pigeonhole, exactly minhash LSH's; wider radii trade
    * recall exactly like simhash), then verify the exact Hamming
    * distance inside the compiled pair-expansion kernel
    * ([[Kernels.hammingPairs]]): popcount(xor) is computed as each
    * pair is generated and only survivors materialize — a bucket never
    * emits its quadratic candidate set. The 8-byte hash rides the band
    * rows, so verification needs NO join back to payloads; the whole
    * operator is one shuffle (band groupBy, CappedCollect-bounded) +
    * one distinct.
    *
    * Output: (doc_a, doc_b, hamming ≤ maxHamming), doc_a < doc_b.
    */
  def phashNearDup(df: DataFrame, idCol: String,
      maxHamming: Int = 3, maxBucket: Int = 10000): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 60, s"bad maxHamming: $maxHamming")
    val h = phashes(df, idCol)
      .select(col(idCol).cast("long").as("__id"), col("phash"))
    val bands = h.select(col("__id"), col("phash"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("phash"), b * 15).bitwiseAND(lit(0x7fffL))): _*))
        .as(Seq("band_idx", "band_key")))
    bands
      .groupBy(col("band_idx"), col("band_key"))
      .agg(graft.functions.CappedCollect.cappedLongPairList(
        col("__id"), col("phash"), maxBucket).as("cl"))
      .filter(col("cl.n").between(2, maxBucket))
      .select(explode(graft.functions.Kernels.hammingPairsOf(
        col("cl.ids"), col("cl.hs"), maxHamming)).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"),
        col("p.hamming").as("hamming"))
      .distinct()
  }

  /** Byte-class histogram of each payload — the content-sniffing
    * audit run BEFORE decode (text, compressed, and media payloads
    * have sharply different byte-class shapes; a feed whose histogram
    * shifts is mislabeled or corrupted upstream). Compiled kernel pass
    * ([[Kernels.byteHistogram]]) inside WholeStageCodegen, the
    * ×buckets melt the only fan-out; every bucket emits (zeros
    * included) so the shape vector always has `buckets` components.
    *
    * Output: (idCol, bucket 0..buckets−1, n, frac_q = ⌊2²⁰·n/len⌋);
    * empty payloads are excluded (no shape to report).
    */
  def byteHistogram(df: DataFrame, idCol: String, buckets: Int = 16): DataFrame =
    df.filter(octet_length(col("payload")) > 0)
      .select(col(idCol),
        octet_length(col("payload")).cast("long").as("__len"),
        posexplode(Kernels.byteHistogramOf(col("payload"), buckets))
          .as(Seq("bucket", "n")))
      .select(col(idCol), col("bucket").cast("long").as("bucket"), col("n"),
        expr("(1048576 * n) div __len").as("frac_q"))

  /** Per-payload byte-class MIX audit on top of [[byteHistogram]]: the
    * dominant class, its exact mass share, and a mixed-content flag
    * (share below `minShareQ`/2²⁰) — the one-row-per-payload verdict a
    * feed gate consumes (a text feed whose payloads stop being
    * dominated by the letter classes is mislabeled; a "jpeg" feed with
    * a dominant single class is padding). Argmax is one
    * max(struct(n, −bucket)) over the histogram rows — smallest-bucket
    * ties, no window; everything stays integer.
    *
    * Output: (idCol, top_bucket, top_n, total_bytes, top_share_q,
    * mixed) — mixed an integer 0/1 flag.
    */
  def byteClassMix(df: DataFrame, idCol: String, buckets: Int = 16,
      minShareQ: Long = 838860 /* 0.8 · 2²⁰ */): DataFrame =
    byteHistogram(df, idCol, buckets)
      .groupBy(col(idCol))
      .agg(max(struct(col("n"), (-col("bucket")).as("nb"))).as("m"),
        sum(col("n")).as("total_bytes"))
      .select(col(idCol), (-col("m.nb")).as("top_bucket"),
        col("m.n").as("top_n"), col("total_bytes"),
        expr("(1048576 * m.n) div total_bytes").as("top_share_q"))
      .withColumn("mixed",
        when(col("top_share_q") < minShareQ, lit(1L)).otherwise(lit(0L)))

  /** Deterministic stand-in for a media decoder — delegates to the
    * [[Kernels.mediaFeatures]] kernel so the local-JVM and plan-side
    * paths share one implementation. Replace the kernel body with the
    * real codec at deployment; this signature stays stable.
    */
  def fakeFeatures(payload: Array[Byte]): Array[Float] =
    Kernels.mediaFeatures(payload, FeatureDim).toFloatArray()
}
