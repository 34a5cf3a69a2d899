package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Synthetic-history checks for the BenchDiff spike/flaky criteria
  * (VERDICT r7 #4: the flat 0.5 s floor hid sub-second regressions on
  * the 60+ queries that run under 0.5 s). */
class BenchDiffSpec extends AnyFunSuite {

  private def line(qs: (String, Double)*)(reruns: (String, String)*) = {
    val q = qs.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    val r = reruns.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    s"""{"metric":"total","value":1.0,"unit":"sec","reps":3,""" +
      s""""queries":{$q},"reruns":{$r},"errors":[],"sf":"/d/sf0.1"}"""
  }

  test("sub-second regression is now visible: 0.2s -> 0.45s flags") {
    val hist = Vector(
      line("hot" -> 0.2, "big" -> 5.0)(),
      line("hot" -> 0.45, "big" -> 5.1)())
    val s = BenchDiff.spikes(hist, 2.0)
    assert(s.map(_._1) == Seq("hot"))
  }

  test("ratio alone is not enough: 0.01s -> 0.05s is noise, not a spike") {
    val hist = Vector(line("tiny" -> 0.01)(), line("tiny" -> 0.05)())
    assert(BenchDiff.spikes(hist, 2.0).isEmpty)
  }

  test("delta alone is not enough: 5.0s -> 5.4s is within 2x") {
    val hist = Vector(line("big" -> 5.0)(), line("big" -> 5.4)())
    assert(BenchDiff.spikes(hist, 2.0).isEmpty)
  }

  test("best is the min over ALL prior same-SF lines, newest compared") {
    val hist = Vector(
      line("q" -> 1.0)(), line("q" -> 0.4)(), line("q" -> 1.1)())
    val s = BenchDiff.spikes(hist, 2.0)
    assert(s == Seq(("q", 1.1, 0.4)))
  }

  test("pre-r8 lines without a reruns map still parse") {
    val old = """{"metric":"total","value":1.0,"unit":"sec","reps":3,""" +
      """"queries":{"q":0.5},"errors":[],"sf":"/d/sf0.1"}"""
    assert(BenchDiff.queries(old) == Map("q" -> 0.5))
    assert(BenchDiff.reruns(old).isEmpty)
  }

  test("rerun tags parse and a 2+-round repeat is flagged flaky") {
    val hist = Vector(
      line("a" -> 0.3, "b" -> 0.3)("a" -> "[1.200,0.300]"),
      line("a" -> 0.3, "b" -> 0.3)(
        "a" -> "[0.900,0.300]", "b" -> "[2.000,0.300]"))
    assert(BenchDiff.reruns(hist.last) == Set("a", "b"))
    // "a" healed in two separate rounds -> intermittent; "b" only once
    assert(BenchDiff.flaky(hist) == Seq("a"))
  }

  test("an errored run's 0.0 placeholder never becomes the best " +
      "(ADVICE r9: would flag every later healthy run as a SPIKE)") {
    val poisoned =
      """{"metric":"total","value":1.0,"unit":"sec","reps":3,""" +
        """"queries":{"q":0.000,"ok":1.0},"reruns":{},""" +
        """"errors":["q"],"sf":"/d/sf0.1"}"""
    val hist = Vector(poisoned, line("q" -> 1.5, "ok" -> 1.0)())
    assert(BenchDiff.errorNames(poisoned) == Set("q"))
    // q has no valid history -> no spike; ok unchanged -> no spike
    assert(BenchDiff.spikes(hist, 2.0).isEmpty)
  }

  test("an errored query in the NEWEST line is not compared at all") {
    val newest =
      """{"metric":"total","value":1.0,"unit":"sec","reps":3,""" +
        """"queries":{"ok":1.0},"reruns":{},""" +
        """"errors":["q"],"sf":"/d/sf0.1"}"""
    val hist = Vector(line("q" -> 0.3, "ok" -> 1.0)(), newest)
    assert(BenchDiff.spikes(hist, 2.0).isEmpty)
  }

  test("flaky tags age out: 2 rerun rounds older than the window no " +
      "longer warn") {
    val ancient = Vector(
      line("a" -> 0.3)("a" -> "[1.200,0.300]"),
      line("a" -> 0.3)("a" -> "[0.900,0.300]"))
    val quiet = Vector.fill(BenchDiff.FlakyWindow)(line("a" -> 0.3)())
    assert(BenchDiff.flaky(ancient) == Seq("a"))
    assert(BenchDiff.flaky(ancient ++ quiet).isEmpty)
  }
}
