package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Composition identity for the dedup-first containment posture: the
  * composed query must equal the ORACLE-DIRECT exact containment
  * restricted to the canonical survivor set — containment values depend
  * only on the pair, so filtering first (and computing df/prefixes over
  * the filtered word relation) must not change any surviving row.
  * Catches a df-recomputation bug (prefix chosen over survivor-df is
  * fine; verify must stay exact), a keeper-set drift between the two
  * code paths, and any accidental semi-join on the wrong side. */
class ContainmentDedupFirstSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("containment-dedupfirst-spec")
    .getOrCreate()

  test("dedup-first == exact containment restricted to survivors") {
    val keep = DedupQueries.dedupCanonical(spark, dir)
      .filter(col("keep")).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b", "containment", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3))).toSet

    val expected = rows(DedupQueries.dedupContainment(spark, dir))
      .filter { case (a, b, _, _) => keep(a) && keep(b) }
    val got = rows(DedupQueries.dedupContainmentDedupFirst(spark, dir))
    assert(got == expected,
      s"dedup-first diverged: extra=${got diff expected}, " +
        s"missing=${expected diff got}")
    // the stage does real work on this fixture: survivors are a strict
    // subset and the composed relation is non-trivial
    val all = spark.read
      .parquet(s"$dir/documents.parquet").count()
    assert(keep.size < all)
  }

  test("posture selector: estimator pinned, choice deterministic, arm exact") {
    // the corrected in-pair rate equals a plain-Scala recount over the
    // SAME sample and the SAME verified pair relation — pins the ×4
    // sample-fraction correction and the sample predicate (r14,
    // VERDICT r13 item 3)
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val sample = d.filter(
      graft.functions.PortableHash.bucket(col("doc_id"), 4) === 0)
    val nSample = sample.count()
    val ids = sample.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    // expected in-pair ids from the FULL exact shingle-Jaccard pair
    // relation restricted to sample×sample (what the sampled LSH arm
    // computes, recall-certain at 0.7)
    val inPair = DedupQueries.minhashPairsOf(sample)
      .collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(inPair.subsetOf(ids))
    val rate = 4.0 * inPair.size / math.max(nSample, 1L).toDouble
    val expectPosture = if (rate >= 0.25) "dedup_first" else "prefix_only"

    val auto = DedupQueries.dedupContainmentAuto(spark, dir)
    val postures = auto.select(col("posture")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(postures == Set(expectPosture),
      s"auto routed $postures, estimator says $expectPosture (rate $rate)")
    // the routed result IS the chosen arm's relation, posture column added
    def rows2(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b", "containment", "jaccard").collect()
        .map(_.toString).sorted.toSeq
    val arm =
      if (expectPosture == "dedup_first")
        DedupQueries.dedupContainmentDedupFirst(spark, dir)
      else DedupQueries.dedupContainmentPrefix(spark, dir)
    assert(rows2(auto) == rows2(arm))
  }
}
