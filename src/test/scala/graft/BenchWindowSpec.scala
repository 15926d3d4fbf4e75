package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** The bench window-contamination machinery (r14 verdict task 2): the
  * fixed-work calibration anchor, the minimal JSON reader it needs to
  * load prior artifacts, and the round-over-round window verdict — a
  * UNIFORMLY slow box inflates every pass equally, so within-run
  * dispersion stays silent (BENCH_r14: 200.86 s vs the same HEAD's
  * clean 134.96 s with n_dispersion = 0); only constant work and a
  * prior round's medians can expose it in-artifact.
  */
class BenchWindowSpec extends AnyFunSpec with Matchers {

  describe("Json.parse") {
    it("reads objects, arrays, strings, numbers, booleans, null") {
      val v = graft.util.Json.parse(
        """{"a": 1.5, "b": [1, -2, 3e2], "s": "x\"y\nA", """ +
          """"t": true, "f": false, "z": null, "o": {"k": "v"}}""")
        .asInstanceOf[Map[String, Any]]
      v("a") shouldBe 1.5
      v("b") shouldBe Vector(1.0, -2.0, 300.0)
      v("s") shouldBe "x\"y\nA"
      v("t") shouldBe true
      v("f") shouldBe false
      assert(v("z") == null)
      v("o") shouldBe Map("k" -> "v")
    }
    it("round-trips a renderFull artifact") {
      val full = Bench.renderFull(
        Seq("q1_agg" -> 0.5, "q2_filter" -> 1.25), Nil, "/sf", runs = 3,
        shapes = Seq("q1_agg" -> Bench.Shape(1, 2, 3, 4)),
        anchors = (Seq(0.31, 0.32), Seq(0.41, 0.40)))
      val v = graft.util.Json.parse(full).asInstanceOf[Map[String, Any]]
      v("n_queries") shouldBe 2.0
      v("queries").asInstanceOf[Map[String, Any]]("q2_filter") shouldBe 1.25
      val anchor = v("anchor").asInstanceOf[Map[String, Any]]
      anchor("st") shouldBe Vector(0.31, 0.32)
      assert(v("window") == null)
    }
    it("rejects malformed input") {
      an[IllegalArgumentException] should be thrownBy
        graft.util.Json.parse("""{"a": }""")
      an[IllegalArgumentException] should be thrownBy
        graft.util.Json.parse("""{"a": 1} trailing""")
    }
  }

  describe("Bench.anchorOnce") {
    it("returns a positive wall time for fixed work") {
      Bench.anchorOnce(1000000L) should be > 0.0
    }
  }

  // a 30-query suite whose prior-round medians are all 1.0 s
  private val prev: Map[String, Double] =
    (1 to 30).map(i => s"q$i" -> 1.0).toMap

  private def shifted(factor: Double): Map[String, Double] =
    prev.view.mapValues(_ * factor).toMap

  describe("Bench.windowVerdict") {
    it("flags a uniform slowdown with an unchanged fingerprint as suspect ambient") {
      val w = Bench.windowVerdict(prev, shifted(1.4),
        Some("abcd1234"), Some("abcd1234"), None, None, "BENCH_r14.json").get
      w.verdict shouldBe "uniform_slowdown_suspect_ambient"
      w.medianRatio shouldBe 1.4 +- 1e-9
      w.fracSameDir shouldBe 1.0
      w.fpMatch shouldBe Some(true)
    }
    it("confirms ambient contamination when the anchor also slowed") {
      val w = Bench.windowVerdict(prev, shifted(1.4),
        Some("abcd1234"), Some("abcd1234"),
        prevAnchor = Some(0.30), curAnchor = Some(0.42),
        "BENCH_r14.json").get
      w.verdict shouldBe "ambient_contamination_confirmed_by_anchor"
      w.anchorRatio.get shouldBe 1.4 +- 1e-9
    }
    it("does NOT blame the window when the fingerprint moved") {
      val w = Bench.windowVerdict(prev, shifted(1.4),
        Some("abcd1234"), Some("ffff0000"), None, None, "p").get
      w.verdict shouldBe "slowdown_with_plan_change"
    }
    it("stays quiet on a clean window") {
      // ±5% alternating noise — no uniform direction, median ~1
      val cur = prev.map { case (k, v) =>
        k -> (if (k.stripPrefix("q").toInt % 2 == 0) v * 1.05 else v * 0.95)
      }
      Bench.windowVerdict(prev, cur, Some("a"), Some("a"), None, None,
        "p").get.verdict shouldBe "clean"
    }
    it("stays quiet when only a few queries regressed (a real regression, not a window)") {
      val cur = prev.map { case (k, v) =>
        k -> (if (Set("q1", "q2", "q3")(k)) v * 3.0 else v)
      }
      // 3 of 30 tripled: median ratio 1.0 — per-query diffing (not the
      // window verdict) owns this case
      Bench.windowVerdict(prev, cur, Some("a"), Some("a"), None, None,
        "p").get.verdict shouldBe "clean"
    }
    it("flags the mirror-image uniform speedup") {
      Bench.windowVerdict(prev, shifted(0.7), Some("a"), Some("a"),
        None, None, "p").get.verdict shouldBe "uniform_speedup"
    }
    it("returns None without a comparable shared set") {
      Bench.windowVerdict(Map("q1" -> 1.0), Map("q1" -> 1.0),
        None, None, None, None, "p") shouldBe None
      // sub-50ms prior queries are noise, excluded from the basis
      Bench.windowVerdict(
        (1 to 30).map(i => s"q$i" -> 0.01).toMap,
        (1 to 30).map(i => s"q$i" -> 0.02).toMap,
        None, None, None, None, "p") shouldBe None
    }
  }

  describe("Bench.loadPrevArtifact") {
    it("reads the builder's full render (queries + fp + anchor)") {
      val full = Bench.renderFull(
        Seq("q1_agg" -> 0.5, "q2_filter" -> 1.25), Nil, "/sf", runs = 3,
        shapes = Seq("q1_agg" -> Bench.Shape(1, 2, 3, 4)),
        anchors = (Seq(0.30, 0.36, 0.32), Seq(0.4)))
      val p = java.nio.file.Files.createTempFile("bench", ".json")
      java.nio.file.Files.writeString(p, full)
      val (qs, fp, anchor) = Bench.loadPrevArtifact(p.toString)
      qs shouldBe Map("q1" -> 0.5, "q2" -> 1.25) // short-key canonical
      fp shouldBe Some(Bench.shapeFp(Seq("q1_agg" -> Bench.Shape(1, 2, 3, 4))))
      anchor shouldBe Some(0.32) // median of the st anchors
      java.nio.file.Files.delete(p)
    }
    it("reads the driver wrapper's parsed.top partial map") {
      val wrapper =
        """{"n": 14, "rc": 0, "tail": "…", "parsed": {"metric": "total",
          |"shapes": {"exch": 5, "fp": "b0c49d58"},
          |"top": {"q139": 5.49, "q94": 3.38}}}""".stripMargin
      val p = java.nio.file.Files.createTempFile("bench", ".json")
      java.nio.file.Files.writeString(p, wrapper)
      val (qs, fp, anchor) = Bench.loadPrevArtifact(p.toString)
      qs shouldBe Map("q139" -> 5.49, "q94" -> 3.38)
      fp shouldBe Some("b0c49d58")
      anchor shouldBe None
      java.nio.file.Files.delete(p)
    }
    it("reads the anchor out of the driver wrapper form (the BENCH_r15 " +
        "shape — the first prior artifact that carries one)") {
      val wrapper =
        """{"n": 15, "rc": 0, "sf": 0.1, "parsed": {"metric": "total",
          |"anchor": {"st": [0.85, 0.89, 0.86], "mt": [0.48, 0.49, 0.47]},
          |"shapes": {"exch": 7, "fp": "b98b6fa2"},
          |"top": {"q139": 4.06, "q134": 2.75}}}""".stripMargin
      val p = java.nio.file.Files.createTempFile("bench", ".json")
      java.nio.file.Files.writeString(p, wrapper)
      val (qs, fp, anchor) = Bench.loadPrevArtifact(p.toString)
      qs shouldBe Map("q139" -> 4.06, "q134" -> 2.75)
      fp shouldBe Some("b98b6fa2")
      anchor shouldBe Some(0.86) // median of parsed.anchor.st
      java.nio.file.Files.delete(p)
    }
    it("degrades to empty on unreadable/malformed artifacts") {
      Bench.loadPrevArtifact("/nonexistent/x.json") shouldBe
        ((Map.empty, None, None))
      val p = java.nio.file.Files.createTempFile("bench", ".json")
      java.nio.file.Files.writeString(p, "not json at all {")
      Bench.loadPrevArtifact(p.toString) shouldBe ((Map.empty, None, None))
      java.nio.file.Files.delete(p)
    }
  }

  describe("Bench.sfToken / prevSf — the cross-SF comparison guard") {
    it("extracts the sf token from dir paths") {
      Bench.sfToken("/root/testdata/sf0.1") shouldBe Some("sf0.1")
      Bench.sfToken("/tmp/graft_sf1_flat") shouldBe Some("sf1")
      Bench.sfToken("/data/nothing") shouldBe None
    }
    it("reads the sf of both artifact forms") {
      val p = java.nio.file.Files.createTempFile("bench", ".json")
      java.nio.file.Files.writeString(p,
        """{"n": 14, "sf": 0.1, "parsed": {"top": {"q1": 1.0}}}""")
      Bench.prevSf(p.toString) shouldBe Some("sf0.1")
      java.nio.file.Files.writeString(p, Bench.renderFull(
        Seq("q1_agg" -> 0.5), Nil, "/root/testdata/sf0.001"))
      Bench.prevSf(p.toString) shouldBe Some("sf0.001")
      java.nio.file.Files.delete(p)
    }
  }

  describe("renderLine with anchors and a window verdict") {
    it("carries both and keeps the size contract") {
      val results = (1 to 220).map(i => f"q${i}_some_long_query_name" -> 0.5)
      val w = Bench.WindowCompare("BENCH_r14.json", 200, 1.39, 0.97,
        Some(true), Some(1.41), "ambient_contamination_confirmed_by_anchor")
      val line = Bench.renderLine(results, Nil, "/root/testdata/sf0.1",
        runs = 3, anchors = (Seq(0.31, 0.33, 0.46), Seq(0.4, 0.41, 0.55)),
        window = Some(w))
      line.length should be <= 1980
      line should include(""""anchor":{"st":[0.31,0.33,0.46]""")
      line should include(""""verdict":"ambient_contamination_confirmed_by_anchor"""")
      line should include(""""median_ratio":1.39""")
    }
  }
}
