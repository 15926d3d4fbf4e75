package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{MediaDecoder, MediaDecoders, Multimodal, StubDecoder}

/** A reversing "codec" standing in for a real image/audio decoder —
  * deliberately NOT derivable from the stub kernels, so a spec can
  * tell which decoder actually ran.
  */
class ReversingDecoder extends MediaDecoder {
  override val name = "reversing"
  override def features(payload: Array[Byte], dim: Int): Array[Float] =
    (0 until dim).map(i =>
      if (payload.isEmpty) -1.0f
      else (payload(payload.length - 1 - (i % payload.length)) & 0xff).toFloat).toArray
  override def resize(payload: Array[Byte], factor: Int): Array[Long] =
    payload.reverse.grouped(factor).map(_.map(b => (b & 0xff).toLong).max).toArray
}

/** The media-decoder SPI: user-local registration shadows built-ins
  * (connection-registry convention), a custom decoder's Invoke path
  * produces its own outputs through the SAME operator surface, and the
  * default stub path stays bit-identical to the compiled kernels the
  * oracle queries (q27/q52) pin.
  */
class MediaDecoderSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def media = Multimodal.ingest(
    Seq((1L, "hello world"), (2L, "abc"), (3L, "")).toDF("id", "content"),
    "id", "content", "text/plain")

  test("registry resolves the stub by default and rejects unknown types") {
    assert(MediaDecoders.resolve("stub") eq StubDecoder)
    val e = intercept[IllegalArgumentException](MediaDecoders.resolve("h264"))
    assert(e.getMessage.contains("h264"))
  }

  test("user-local registration shadows and resolves like connections") {
    MediaDecoders.register("reversing")(new ReversingDecoder)
    assert(MediaDecoders.resolve("reversing").name === "reversing")
    // shadowing a BUILT-IN type is allowed (book.js:176-184 order)
    MediaDecoders.register("stub")(new ReversingDecoder)
    assert(MediaDecoders.resolve("stub").name === "reversing")
    MediaDecoders.register("stub")(StubDecoder) // restore for later suites
    assert(MediaDecoders.resolve("stub") eq StubDecoder)
  }

  test("a custom decoder drops in without touching the kernel or schema") {
    val dec = new ReversingDecoder
    val got = Multimodal.extractFeatures(media, "id", dec)
    assert(got.schema.fieldNames.toSeq === Seq("id", "features"))
    val rows = got.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // the decoder's own JVM computation is what the plan produced
    val payload = "hello world".getBytes("UTF-8")
    assert(rows(1L) === dec.features(payload, Multimodal.FeatureDim).toSeq)
    assert(rows(3L) === Seq.fill(Multimodal.FeatureDim)(-1.0f))
    // and it differs from the stub (proof the override actually ran)
    val stub = Multimodal.extractFeatures(media, "id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rows(1L) !== stub(1L))
  }

  test("custom resize flows through the same surface") {
    val dec = new ReversingDecoder
    val got = Multimodal.resize(media, "id", 4, dec)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(2L) === dec.resize("abc".getBytes("UTF-8"), 4).toSeq)
  }

  test("imageio decoder: real PNG pixels decode to known luminance features") {
    import java.awt.image.BufferedImage
    // 2x2 fixture with exactly-known pixels (PNG is lossless):
    // (0,0) black  (1,0) white
    // (0,1) red    (1,1) blue
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000); img.setRGB(1, 0, 0xffffff)
    img.setRGB(0, 1, 0xff0000); img.setRGB(1, 1, 0x0000ff)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val png = buf.toByteArray

    val dec = graft.ops.MediaDecoders.resolve("imageio")
    assert(dec.name === "imageio")
    // dim=4 over a 2x2 raster: one cell per pixel, row-major; BT.601
    // luminance normalized to [0,1]
    val feats = dec.features(png, 4)
    val want = Seq(0.0, 1.0, 0.299, 0.114)
    feats.toSeq.zip(want).zipWithIndex.foreach { case ((got, w), i) =>
      assert(math.abs(got - w) < 1e-3, s"cell $i: $got vs $w")
    }
    // factor=2 downsample of 2x2 -> one block: mean luminance rounded
    val small = dec.resize(png, 2)
    assert(small.toSeq === Seq(math.round((0.0 + 255.0 + 76.245 + 29.07) / 4)))
  }

  test("imageio decoder: JPEG decodes too; corrupt bytes degrade to the stub, not a crash") {
    import java.awt.image.BufferedImage
    // uniform gray survives JPEG's lossy round-trip nearly exactly
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, 0x808080)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", buf)
    val dec = graft.ops.MediaDecoders.resolve("imageio")
    val feats = dec.features(buf.toByteArray, 4)
    assert(feats.length === 4)
    feats.foreach(f => assert(math.abs(f - 128.0 / 255.0) < 0.02, f.toString))
    // not-an-image payloads fall back to the stub's byte kernels — a
    // corrupt object in a 100 TB scan degrades its row, never the job
    val junk = "definitely not an image".getBytes("UTF-8")
    assert(dec.features(junk, 4).toSeq === StubDecoder.features(junk, 4).toSeq)
    assert(dec.resize(junk, 4).toSeq === StubDecoder.resize(junk, 4).toSeq)
  }

  test("imageio decoder runs through the Multimodal operator surface") {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000); img.setRGB(1, 0, 0xffffff)
    img.setRGB(0, 1, 0xff0000); img.setRGB(1, 1, 0x0000ff)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val png = buf.toByteArray
    val df = Seq((1L, png)).toDF("id", "payload")
      .withColumn("media_type", lit("image/png"))
    val dec = graft.ops.MediaDecoders.resolve("imageio")
    val got = Multimodal.extractFeatures(df, "id", dec).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(got(1L) === dec.features(png, Multimodal.FeatureDim).toSeq)
  }

  test("the default stub path is the compiled kernel path, bit-for-bit") {
    val viaSpi = Multimodal.extractFeatures(media, "id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val viaKernel = media.select(col("id"),
      graft.functions.Kernels.mediaFeaturesOf(col("payload"), Multimodal.FeatureDim))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(viaSpi === viaKernel)
  }

  test("imageio plan shape: payload-pruned scan, zero exchanges (q27/q52/q141 surface)") {
    // the decode stage's scale contract, end-to-end with the REAL
    // decoder registered: a parquet source with bystander columns must
    // plan (1) a scan that reads ONLY (doc_id, payload) — a 100 TB
    // media table's metadata/annotation columns never leave the
    // footers — and (2) no exchange of any kind: decode, resize, and
    // perceptual hashing are map-side, so payload bytes never cross
    // the network. String-shape asserts on the executed plan, the
    // PlanContractSpec idiom.
    import java.awt.image.BufferedImage
    val img = new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, 0x336699)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val png = buf.toByteArray
    val dir = java.nio.file.Files.createTempDirectory("graft-media-plan").toString
    Seq((1L, png, "annotation", 42L),
        (2L, "not an image".getBytes("UTF-8"), "bystander", 43L))
      .toDF("doc_id", "payload", "extra_label", "extra_score")
      .write.mode("overwrite").parquet(dir)
    val src = spark.read.parquet(dir)
    val dec = MediaDecoders.resolve("imageio")
    val surfaces = Seq(
      "q27 features" -> Multimodal.extractFeatures(src, "doc_id", dec),
      "q52 resize" -> Multimodal.resize(src, "doc_id", 4, dec),
      "q141 phash" -> Multimodal.phashes(src, "doc_id"))
    surfaces.foreach { case (tag, out) =>
      assert(out.collect().length === 2, tag) // real decoder executes (and degrades) per row
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"$tag is not map-side — an exchange appeared:\n$plan")
      assert(plan.contains("payload"), s"$tag scan lost the payload column")
      assert(!plan.contains("extra_label") && !plan.contains("extra_score"),
        s"$tag reads bystander columns — pruning failed:\n$plan")
    }
  }
}
