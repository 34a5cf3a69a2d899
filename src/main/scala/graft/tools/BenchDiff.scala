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
  */
object BenchDiff {
  private val entry: Regex = """"([a-z0-9_]+)":([0-9.]+)""".r

  private def queries(line: String): Map[String, Double] = {
    val start = line.indexOf("\"queries\":{")
    val end = line.indexOf("}", start)
    require(start >= 0 && end > start,
      s"malformed history line (no \"queries\" map): ${line.take(120)}")
    entry.findAllMatchIn(line.substring(start + 11, end))
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

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
    val past = lines.init.map(queries)
    val cur = queries(lines.last)
    val spikes = cur.toSeq.flatMap { case (name, now) =>
      val hist = past.flatMap(_.get(name))
      if (hist.isEmpty) None
      else {
        val best = hist.min
        // floor tiny denominators: a 0.2 s query doubling is noise
        if (now > threshold * math.max(best, 0.5))
          Some((name, now, best)) else None
      }
    }.sortBy { case (_, now, best) => -(now / best) }
    spikes.foreach { case (name, now, best) =>
      println(f"[benchdiff] SPIKE $name%-24s now=$now%7.2f best=$best%7.2f x${now / best}%.1f")
    }
    if (spikes.isEmpty) println(s"[benchdiff] no query above ${threshold}x its historical best")
    else sys.exit(1)
  }
}
