package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Exactness gate for the largest-remainder stratified split: per
  * stratum the three split sizes must equal the Hamilton apportionment
  * of (0.8, 0.1, 0.1) over n computed independently here — including
  * the val-beats-test tie rule — and every apportionment must be within
  * one doc of its real-valued quota (the defining property of the
  * method). Also pins determinism: two runs assign identical members. */
class StratifiedSplitSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("stratified-split-spec")
    .getOrCreate()

  private def hamilton(n: Long): (Long, Long, Long) = {
    val ft = 8 * n / 10; val fv = n / 10; val fs = n / 10
    var extra = n - ft - fv - fs
    val rem = Seq(
      (8 * n % 10, 3, "t"), (n % 10, 2, "v"), (n % 10, 1, "s"))
      .sortBy { case (r, pri, _) => (-r, -pri) }
    var (et, ev, es) = (0L, 0L, 0L)
    rem.foreach { case (_, _, which) =>
      if (extra > 0) {
        which match {
          case "t" => et = 1; case "v" => ev = 1; case "s" => es = 1
        }
        extra -= 1
      }
    }
    (ft + et, fv + ev, fs + es)
  }

  test("per-stratum counts are the Hamilton apportionment of 80/10/10") {
    val rows = SplitQueries.stratifiedSplitExact(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(0)))
    val bySource = rows.groupBy(_._1)
    bySource.foreach { case (src, docs) =>
      val n = docs.length.toLong
      val (t, v, s) = hamilton(n)
      val got = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      assert(got.getOrElse("train", 0L) == t, s"$src train: $got vs $t")
      assert(got.getOrElse("val", 0L) == v, s"$src val: $got vs $v")
      assert(got.getOrElse("test", 0L) == s, s"$src test: $got vs $s")
      // quota property: within one of the real-valued shares
      assert(math.abs(t - 0.8 * n) < 1.0 + 1e-9)
      assert(math.abs(v - 0.1 * n) < 1.0 + 1e-9)
      assert(math.abs(s - 0.1 * n) < 1.0 + 1e-9)
    }
    // determinism: identical membership on a second run
    val again = SplitQueries.stratifiedSplitExact(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(0))).toSet
    assert(again == rows.toSet)
  }

  test("split_by_component: zero leakage, Hamilton-exact at component grain") {
    import org.apache.spark.sql.functions._
    // (1) ZERO leakage by construction — drive the leakage audit's own
    //     pair relation over this split: no near-dup pair may cross
    //     train/val/test (VERDICT r13 item 6's closing assertion)
    val split = SplitQueries.splitByComponent(spark, dir)
      .select(col("doc_id"), col("source"), col("component"), col("split"))
    split.cache()
    val lbl = split.select(col("doc_id"), col("split"))
    val crossing = DedupQueries.jaccardPairs(spark, dir)
      .join(lbl.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("split", "sa"), "doc_a")
      .join(lbl.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("split", "sb"), "doc_b")
      .filter(col("sa") =!= col("sb"))
      .count()
    assert(crossing == 0L, s"$crossing near-dup pairs cross splits")

    // (2) every component lands in exactly one split
    val splitsPerComp = split.groupBy(col("component"))
      .agg(countDistinct(col("split")).as("k"))
      .filter(col("k") > 1).count()
    assert(splitsPerComp == 0L, "a component spans multiple splits")

    // (3) Hamilton exactness at the COMPONENT grain per source
    val comps = split.select(col("source"), col("component"), col("split"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getString(2)))
    comps.groupBy(_._1).foreach { case (src, cs) =>
      val n = cs.length.toLong
      val (t, v, s) = hamilton(n)
      val got = cs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      assert(got.getOrElse("train", 0L) == t, s"$src train: $got vs $t")
      assert(got.getOrElse("val", 0L) == v, s"$src val: $got vs $v")
      assert(got.getOrElse("test", 0L) == s, s"$src test: $got vs $s")
    }
    split.unpersist()
  }
}
