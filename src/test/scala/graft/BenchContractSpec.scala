package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** The bench stdout contract: ONE JSON line that ALWAYS fits the
  * driver's ~2000-char stdout tail-capture, headline first, failures
  * visible. Round 4 and round 7 both lost the headline to oversized
  * lines (`parsed: null` in the round artifact); round 6 hid eight
  * failing queries as ~0.06 s timings. These pins make every
  * regression of that kind a test failure instead of a lost round.
  */
class BenchContractSpec extends AnyFunSpec with Matchers {

  private def fakeResults(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => (f"q${i}%d_some_longish_query_name", 0.123 * (i % 7 + 1)))

  private val sf = "/root/testdata/sf0.1"

  describe("Bench.renderLine") {
    it("fits the tail window at every suite size, including 181+ queries") {
      for (n <- Seq(1, 16, 67, 112, 181, 300, 500)) {
        val line = Bench.renderLine(fakeResults(n), Nil, sf)
        withClue(s"n=$n len=${line.length}: ") {
          line.length should be <= 1980
        }
      }
    }

    it("always leads with the headline metric/value/n_queries/mean") {
      for (n <- Seq(1, 181, 500)) {
        val line = Bench.renderLine(fakeResults(n), Nil, sf)
        line should startWith("{\"metric\":\"total\",\"value\":")
        line should include(s""""n_queries":$n""")
        line should include("\"mean_query_sec\":")
        line should include("\"n_errs\":0")
        line should endWith("}")
      }
    }

    it("is parseable JSON at small and overflow sizes") {
      // no JSON lib on the test classpath beyond our writer, so pin the
      // structural invariants a parser needs: balanced braces, no raw
      // newline, quoted keys
      for (n <- Seq(3, 181)) {
        val line = Bench.renderLine(fakeResults(n), Nil, sf)
        line.count(_ == '{') shouldBe line.count(_ == '}')
        line should not include "\n"
      }
    }

    it("keeps the full per-query map while it fits") {
      val line = Bench.renderLine(fakeResults(16), Nil, sf)
      line should include("\"queries\":{")
      (1 to 16).foreach { i =>
        line should include(s""""q${i}_some_longish_query_name":""")
      }
    }

    it("degrades to the top-K-slowest form at 181 queries without losing the slowest") {
      val results = fakeResults(181)
      val line = Bench.renderLine(results, Nil, sf)
      line.length should be <= 1980
      // the overflow form is marked "top" (partial), not "queries"
      line should include("\"top\":{")
      // the slowest query must survive truncation — it is what the
      // plan audit reads
      val slowest = results.maxBy(_._2)._1.takeWhile(_ != '_')
      line should include(s""""$slowest":""")
    }

    it("surfaces failures as n_errs + errs instead of swallowing them") {
      val line = Bench.renderLine(fakeResults(20),
        Seq("q7_events_scan", "q12_sessionize"), sf)
      line should include(""""n_errs":2""")
      line should include(""""errs":["q7_events_scan","q12_sessionize"]""")
    }

    it("caps the errs list so a catastrophic run still fits the window") {
      val errs = (1 to 200).map(i => s"q${i}_some_longish_query_name")
      val line = Bench.renderLine(fakeResults(200), errs, sf)
      line.length should be <= 1980
      line should include(""""n_errs":200""")
    }

    it("handles the empty suite without dividing by zero") {
      val line = Bench.renderLine(Nil, Nil, sf)
      line should include(""""n_queries":0""")
      line.length should be <= 1980
    }

    it("carries the contamination evidence: per-pass loadavg + dispersion verdicts") {
      val disp = Seq(Bench.Dispersion("q40_rollup", 13.62, 1.1,
        Seq(1.1, 13.62, 14.0)))
      val la = Seq("0.52 0.61 0.55", "5.10 3.20 1.80", "0.60 0.70 0.60")
      val line = Bench.renderLine(fakeResults(20), Nil, sf, runs = 3,
        loadavgs = la, dispersion = disp)
      line should include(""""n_dispersion":1""")
      line should include(""""dispersion":[{"q":"q40","med":13.62,"best":1.10}]""")
      line should include(""""loadavg":["0.52 0.61 0.55","5.10 3.20 1.80","0.60 0.70 0.60"]""")
      // and the clean case stays compact + well-formed
      val clean = Bench.renderLine(fakeResults(20), Nil, sf, runs = 3,
        loadavgs = la)
      clean should include(""""n_dispersion":0""")
      clean should include(""""dispersion":[]""")
    }

    it("carries plan-shape totals + fingerprint, still fitting the window") {
      val shapes = (1 to 217).map(i =>
        (s"q${i}_some_longish_query_name", Bench.Shape(2, 1, 3, 4)))
      val line = Bench.renderLine(fakeResults(217), Nil, sf, shapes = shapes)
      line.length should be <= 1980
      line should include(
        s""""shapes":{"exch":${217 * 2},"bc":217,"scan":${217 * 3},"cg":${217 * 4},"fp":"""")
      // no shapes -> explicit empty object, not a missing key
      Bench.renderLine(fakeResults(5), Nil, sf) should include(""""shapes":{}""")
    }

    it("the shape fingerprint flips on a per-query change even when totals net out") {
      val base = Seq(("qa", Bench.Shape(2, 1, 3, 4)), ("qb", Bench.Shape(1, 1, 2, 2)))
      // qa gains a shuffle, qb loses one: totals identical, map different
      val drift = Seq(("qa", Bench.Shape(3, 1, 3, 4)), ("qb", Bench.Shape(0, 1, 2, 2)))
      Bench.shapeFp(base) should not be Bench.shapeFp(drift)
      // order-independent: the fingerprint canonicalizes by name
      Bench.shapeFp(base.reverse) shouldBe Bench.shapeFp(base)
      val l1 = Bench.renderLine(fakeResults(2), Nil, sf, shapes = base)
      val l2 = Bench.renderLine(fakeResults(2), Nil, sf, shapes = drift)
      l1 should not be l2
    }

    it("dispersion/loadavg are capped so a pathological run still fits the window") {
      val disp = (1 to 300).map(i =>
        Bench.Dispersion(s"q${i}_some_longish_query_name", 9.99, 0.5,
          Seq(0.5, 9.99, 10.0)))
      val la = (1 to 300).map(_ => "12.34 11.00 10.55")
      val line = Bench.renderLine(fakeResults(300), Nil, sf, runs = 300,
        loadavgs = la, dispersion = disp)
      line.length should be <= 1980
      line should include(""""n_dispersion":300""")
    }
  }

  describe("Bench.renderFull") {
    it("carries every query at full precision plus the uncapped errs list") {
      val errs = (1 to 20).map(i => s"q${i}_x")
      val full = Bench.renderFull(fakeResults(181), errs, sf)
      (1 to 181).foreach { i =>
        full should include(s""""q${i}_some_longish_query_name":""")
      }
      full should include(""""n_errs":20""")
      full should include(""""q20_x"""")
    }

    it("carries uncapped dispersion with raw passes and full names") {
      val disp = Seq(Bench.Dispersion("q40_rollup", 13.62, 1.1,
        Seq(1.1, 13.62, 14.0)))
      val full = Bench.renderFull(fakeResults(5), Nil, sf, runs = 3,
        loadavgs = Seq("0.5 0.6 0.5"), dispersion = disp)
      full should include(""""dispersion":[{"q":"q40_rollup","med":13.620,""")
      full should include(""""raws":[1.100,13.620,14.000]""")
      full should include(""""loadavg":["0.5 0.6 0.5"]""")
    }

    it("carries the full per-query shape map plus the same totals/fingerprint") {
      val shapes = Seq(("qa_x", Bench.Shape(2, 1, 3, 4)),
        ("qb_y", Bench.Shape(1, 0, 2, 2)))
      val full = Bench.renderFull(fakeResults(2), Nil, sf, shapes = shapes)
      full should include(
        """"shapes_by_query":{"qa_x":{"exch":2,"bc":1,"scan":3,"cg":4},"qb_y":{"exch":1,"bc":0,"scan":2,"cg":2}}""")
      full should include(
        s""""shapes":{"exch":3,"bc":1,"scan":5,"cg":6,"fp":"${Bench.shapeFp(shapes)}"}""")
    }
  }

  describe("Bench.medians") {
    it("reports the per-query median over passes, preserving order") {
      val passes = Seq(
        Seq("qa" -> 1.0, "qb" -> 10.0),
        Seq("qa" -> 9.0, "qb" -> 12.0),
        Seq("qa" -> 2.0, "qb" -> 11.0))
      // odd pass count: the middle value, robust to one outlier pass
      Bench.medians(passes) shouldBe Seq("qa" -> 2.0, "qb" -> 11.0)
    }

    it("even pass count averages the middle two") {
      val passes = Seq(Seq("qa" -> 1.0), Seq("qa" -> 3.0))
      Bench.medians(passes) shouldBe Seq("qa" -> 2.0)
    }

    it("the runs field is stamped into both render forms") {
      Bench.renderLine(fakeResults(5), Nil, sf, runs = 2) should
        include(""""runs":2""")
      Bench.renderFull(fakeResults(5), Nil, sf, runs = 3) should
        include(""""runs":3""")
    }
  }
}
