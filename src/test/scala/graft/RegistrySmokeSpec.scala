package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Every `SparkEntry.queries` entry must BUILD and RUN against the live
  * testdata — one generated test per registry name.
  *
  * Why this exists (VERDICT r9): the round-9 testdata regeneration
  * changed the events `ts` encoding and silently broke 11 registry
  * queries while 82 of 84 tests stayed green, because nothing in
  * `src/test` forced analysis of the registry surface. This spec turns
  * any future testdata/environment drift into a red `sbt test` within
  * one run: analysis exceptions (DATATYPE_MISMATCH and friends) surface
  * at plan build, execution drift at the `limit(1)` action.
  *
  * sf0.001 keeps the whole sweep inside the CI time budget; value-level
  * correctness stays the DuckDB oracle's job (Verify + selfcheck).
  */
class RegistrySmokeSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("registry-smoke")
    .getOrCreate()

  test("flagship entry() returns rows") {
    assert(SparkEntry.entry(spark).limit(1).count() == 1L)
  }

  /** The documented no-oracle set — every name here must carry a
    * justification in COVERAGE.md. A new query missing from BOTH
    * oracleSql and this list is a gate hole: the driver would silently
    * record a weaker rows-only check for it. */
  private val noOracleByDesign = Set(
    "q20_approx_distinct", // HLL sketch — exact twin q20_exact_distinct
    "q21_approx_aggs",     // percentile sketch — exact twin q21_stat_aggs
    "q23_permutation",     // seeded resample RNG — spec-oracled vs brute
                           // force; exact twin q23_permutation_exact is
                           // hash-oracled (r11); MC p-values machine-
                           // gated within 3·SE of exact enumeration on
                           // the shared domain (ToleranceSpec, r14)
    // pickle_migrate / pickle_ds_scan left this list in r13: DuckDB
    // still cannot read pickle, but it CAN read the pandas-exported
    // parquet mirror (tools/picklemirror.py), which is now their oracle
    "ann_ivf")             // k-means|| fit (Spark-ML internal randomness) —
                           // recall/budget gate (AnnRecallSpec); frozen-
                           // codebook twin ann_ivf_assign is hash-oracled
                           // (r11), and the deterministic Lloyd fit
                           // itself is hash-oracled as ann_ivf_exactfit
                           // (r13)

  test("registry names are unique across all contributing files") {
    // SparkEntry.queries is a toMap over a hand-maintained concatenation;
    // a name collision would silently DROP a query from the driver
    // surface (last write wins) with every other test still green
    val names = SparkEntry.registryNames
    val dupes = names.groupBy(identity).collect {
      case (n, hits) if hits.size > 1 => n
    }
    assert(dupes.isEmpty, s"duplicate registry names: ${dupes.toSeq.sorted}")
  }

  test("every registry query is oracled or documented no-oracle") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracle SQL without a query: ${o -- q}")
    val unoracled = q -- o -- noOracleByDesign
    assert(unoracled.isEmpty,
      s"queries with neither oracle SQL nor a documented waiver: $unoracled")
    assert((noOracleByDesign -- q).isEmpty,
      s"stale no-oracle waivers: ${noOracleByDesign -- q}")
    assert((noOracleByDesign & o).isEmpty,
      s"waived queries that now HAVE oracles (drop the waiver): " +
        s"${noOracleByDesign & o}")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"registry $name builds and runs at sf0.001") {
      // limit(1).count() forces full analysis + at least one task; most
      // registry queries end in an orderBy/aggregate, so the limit does
      // not skip meaningful work at this SF
      val df = fn(spark, dir)
      df.limit(1).count() // any row count (incl. 0) is fine; throwing is not
    }
  }
}
