package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the survivor rule of `dedup_canonical` (VERDICT r9 next-step 4):
  * highest quality wins the cluster, EQUAL rounded quality keeps the
  * smallest doc_id. Value-level agreement with DuckDB is the oracle's
  * job; this spec is the semantic contract on synthetic clusters where
  * the intended winner is known by construction.
  */
class DedupCanonicalSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("dedup-canonical-spec")
    .getOrCreate()

  // base text: 12 words, enough distinct 3-grams that appending 3 words
  // keeps shingle-Jaccard ≈ 10/13 ≥ 0.7 (same cluster)
  private val base =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("dedup_canonical_spec").toString
    graft.core.TempDirs.cleanOnExit(java.nio.file.Paths.get(dir))
    rows.toDF("doc_id", "source", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("equal quality: the SMALLEST doc_id survives the cluster") {
    // identical texts -> Jaccard 1.0, identical quality -> pure tie
    val dir = writeDocs(Seq(
      (7L, "s1", base), (3L, "s1", base), (9L, "s1", base)))
    val out = DedupQueries.dedupCanonical(spark, dir)
      .select("doc_id", "component", "canonical_id", "keep")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    assert(out == Seq((3L, 3L, 3L, true), (7L, 3L, 3L, false),
      (9L, 3L, 3L, false)))
  }

  test("higher quality beats smaller doc_id") {
    // doc 5 = base + 3 stopwords: more words AND higher stopword ratio
    // -> strictly higher quality than doc 1; still Jaccard >= 0.7
    val better = base + " the of and"
    val dir = writeDocs(Seq((1L, "s1", base), (5L, "s1", better)))
    val rows = DedupQueries.dedupCanonical(spark, dir)
      .select("doc_id", "component", "canonical_id", "quality", "keep")
      .collect()
    assert(rows.length == 2)
    val byId = rows.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    // one cluster rooted at min id 1, but the canonical is 5
    assert(byId(1L)._1 == 1L && byId(5L)._1 == 1L)
    assert(byId(1L)._2 == 5L && byId(5L)._2 == 5L)
    assert(byId(5L)._3 > byId(1L)._3)
    assert(!byId(1L)._4 && byId(5L)._4)
  }

  test("singletons keep themselves (no pair graph membership)") {
    val dir = writeDocs(Seq(
      (1L, "s1", base),
      (2L, "s2", "zulu yankee xray whiskey victor uniform tango sierra " +
        "romeo quebec papa oscar")))
    val out = DedupQueries.dedupCanonical(spark, dir)
      .select("doc_id", "canonical_id", "keep")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSeq
    assert(out == Seq((1L, 1L, true), (2L, 2L, true)))
  }
}
