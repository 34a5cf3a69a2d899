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
}
