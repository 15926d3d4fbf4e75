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

  test("the default stub path is the compiled kernel path, bit-for-bit") {
    val viaSpi = Multimodal.extractFeatures(media, "id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val viaKernel = media.select(col("id"),
      graft.functions.Kernels.mediaFeaturesOf(col("payload"), Multimodal.FeatureDim))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(viaSpi === viaKernel)
  }
}
