package graft.tools

import scala.io.Source
import scala.util.matching.Regex

/** Spike detector over BENCH_HISTORY.jsonl (written by graft.Bench):
  * compares the newest run's per-query medians against the minimum of
  * all previous lines and prints queries above a ratio threshold
  * (default 2×, override as arg). Exit 1 if any spike is found, so the
  * check can gate automation. Zero dependencies — the history lines are
  * flat `"name":num` maps, parsed with a regex rather than pulling a
  * JSON library into the main classpath.
  *
  * Spike criterion (r8): `now > threshold × best AND now − best >
  * MinDelta (0.2 s)`. The previous flat `max(best, 0.5)` floor made the
  * detector blind to every query running under ~0.5 s — 60+ of the
  * suite's 92 — so a 0.2 s → 0.45 s hot-path regression passed silently.
  * The relative test keeps scheduler jitter (±50 ms on this VM) from
  * flagging sub-0.1 s queries; the absolute delta keeps a doubling from
  * 0.01 s to 0.02 s (pure noise) out, while a genuine 0.25 s climb on a
  * 0.2 s query is now visible.
  *
  * Flaky detection (r8): Bench tags each second-chance re-measurement in
  * its history line (`"reruns":{name:[m1,m2]}`). A query rerun-healed in
  * ONE round is a host-window artifact; the SAME query needing a rerun
  * in 2+ of the trailing [[FlakyWindow]] same-SF rounds is an
  * intermittent regression the better-of-two policy would otherwise keep
  * discarding — printed as FLAKY (warning, not exit-1: the kept medians
  * are real measurements; the flag tells the builder to look at the raw
  * samples in BENCH_FULL.json). The window is recency-bounded (r9): tags
  * accumulate in the append-only history forever, so an unwindowed count
  * would keep branding a long-since-healed query FLAKY indefinitely.
  */
object BenchDiff {
  /** A spike must clear BOTH a ratio and an absolute delta. */
  val MinDelta = 0.2

  /** Flaky counting looks only at this many trailing same-SF lines. */
  val FlakyWindow = 5

  // value is either a bare number (queries map) or a [m1,m2] pair
  // (reruns map); the alternation keeps `[0-9.]+` from swallowing the
  // comma that separates adjacent entries
  private val entry: Regex = """"([a-z0-9_]+)":(\[[0-9.,]+\]|[0-9.]+)""".r

  private def section(line: String, key: String): Map[String, String] = {
    val tag = "\"" + key + "\":{"
    val start = line.indexOf(tag)
    if (start < 0) return Map.empty
    val end = line.indexOf("}", start)
    require(end > start,
      s"malformed history line (unterminated $key map): ${line.take(120)}")
    entry.findAllMatchIn(line.substring(start + tag.length, end))
      .map(m => m.group(1) -> m.group(2)).toMap
  }

  private[tools] def queries(line: String): Map[String, Double] = {
    val m = section(line, "queries")
    // an empty map is malformed UNLESS the run recorded errors — an
    // all-errored run legitimately measured nothing (Bench stopped
    // appending such lines in r10, but a hand-written or legacy line
    // must degrade to "no data", not crash every future diff)
    require(m.nonEmpty || errorNames(line).nonEmpty,
      s"malformed history line (no \"queries\" map): ${line.take(120)}")
    m.map { case (k, v) => k -> v.toDouble }
  }

  /** Names tagged as second-chance reruns in a history line (empty for
    * pre-r8 lines, which carried no `reruns` map). */
  private[tools] def reruns(line: String): Set[String] =
    section(line, "reruns").keySet

  /** Names listed in a line's `errors` array. A query that errored in a
    * run has no real measurement there — its history entry (if any old
    * line wrote a 0.0 placeholder) must never become the "best", or every
    * later healthy run would flag as a permanent SPIKE (ADVICE r9). */
  private[graft] def errorNames(line: String): Set[String] = {
    val tag = "\"errors\":["
    val start = line.indexOf(tag)
    if (start < 0) return Set.empty
    val end = line.indexOf("]", start)
    require(end > start,
      s"malformed history line (unterminated errors array): ${line.take(120)}")
    // any quoted string, not just [a-z0-9_]+ (ADVICE r10): an error name
    // with uppercase/dots/hyphens must not evade the 0.0-placeholder
    // exclusion and poison best-of-history
    """"([^"]+)"""".r
      .findAllMatchIn(line.substring(start + tag.length, end))
      .map(_.group(1)).toSet
  }

  /** Pure spike criterion over same-SF history lines (newest last):
    * (name, now, best) for every query whose newest median exceeds
    * `threshold × best` AND `best + MinDelta`. */
  private[tools] def spikes(lines: Vector[String], threshold: Double)
      : Seq[(String, Double, Double)] = {
    // per-line error exclusion on BOTH sides: an errored query's entry
    // (or legacy 0.0 placeholder) is not a measurement
    val past = lines.init.map(l => queries(l) -- errorNames(l))
    (queries(lines.last) -- errorNames(lines.last)).toSeq.flatMap {
      case (name, now) =>
      val hist = past.flatMap(_.get(name))
      if (hist.isEmpty) None
      else {
        val best = hist.min
        if (now > threshold * best && now - best > MinDelta)
          Some((name, now, best)) else None
      }
    }.sortBy { case (_, now, best) => -(now / best) }
  }

  /** Queries rerun-tagged in >= 2 of the trailing [[FlakyWindow]] lines
    * (older tags age out, so a healed query stops warning). */
  private[tools] def flaky(lines: Vector[String]): Seq[String] =
    lines.takeRight(FlakyWindow).flatMap(reruns).groupBy(identity)
      .collect { case (n, hits) if hits.size >= 2 => n }.toSeq.sorted

  def main(args: Array[String]): Unit = {
    val threshold = args.headOption.map(_.toDouble).getOrElse(2.0)
    val all = Source.fromFile("BENCH_HISTORY.jsonl").getLines()
      .filter(_.nonEmpty).toVector
    require(all.nonEmpty, "BENCH_HISTORY.jsonl is empty")
    // compare same-SF lines only: a sf0.001 line's medians are not a
    // baseline for a sf0.1 run. Fail loudly on a tagless newest line —
    // an empty fallback would silently keep EVERY line and mix SFs
    val sfTag = """"sf":"[^"]*"""".r.findFirstIn(all.last)
      .getOrElse(sys.error(
        s"newest history line has no sf tag: ${all.last.take(120)}"))
    val lines = all.filter(_.contains(sfTag))
    require(lines.size >= 2,
      s"need >= 2 history lines at $sfTag to diff, have ${lines.size}")
    val found = spikes(lines, threshold)
    found.foreach { case (name, now, best) =>
      println(f"[benchdiff] SPIKE $name%-24s now=$now%7.2f best=$best%7.2f x${now / best}%.1f")
    }
    flaky(lines).foreach { name =>
      println(s"[benchdiff] FLAKY $name rerun-tagged in 2+ rounds — " +
        "intermittent regression? see raw samples in BENCH_FULL.json")
    }
    if (found.isEmpty)
      println(s"[benchdiff] no query above ${threshold}x+${MinDelta}s its historical best")
    else sys.exit(1)
  }
}
