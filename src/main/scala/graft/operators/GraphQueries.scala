package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over the near-dup pair graph — PageRank as
  * the representative of the fixed-point-iteration class (power
  * iteration on a sparse matrix), the third graph shape next to the
  * single-pass pair queries and the contraction-style connected
  * components: per round, ONE join of the rank vector against the edge
  * relation and one map-side-combined aggregation — the classic Spark
  * iterative-dataflow pattern (the original RDD paper's running
  * example), with `localCheckpoint` per round so the plan does not
  * accrete five rounds of lineage (the CC precedent).
  *
  * Graph: the word-Jaccard ≥ 0.7 pairs ([[DedupQueries.bandedPairs]],
  * the banded candidate path with exact verification — r16)
  * as an undirected graph (both directions materialized); within a
  * near-dup corpus, high PageRank marks the TEMPLATE documents — hubs
  * every near-copy points at — which is the curation use (rank the
  * cluster representative by centrality instead of [[dedupCanonical]]'s
  * quality score).
  *
  * Numerics: d = 0.85; every node in the graph has degree ≥ 1 by
  * construction so no dangling-mass correction is needed; 5 rounds of
  * double sums differ cross-engine only in association order (the map
  * is a contraction, so the ~1e-16 per-round difference stays ~1e-15
  * total), and the final round(·,6) is driftaudit-guarded like every
  * rounded column. */
object GraphQueries {

  private val d = 0.85
  private val iters = 5

  /** Full rank relation (doc_id, deg, pr) — shared by the top-k query
    * and the mass-conservation spec. */
  private[operators] def fullRanks(s: SparkSession, dir: String): DataFrame =
    fullRanksFrom(DedupQueries.bandedPairs(s, dir))

  /** The iteration engine over ANY (doc_a, doc_b) pair relation. Split
    * out because the operator's measured 30× slope is ~entirely the
    * EXACT pair derivation feeding it (NOTES_r12: 256 s total vs ~5.5 s
    * for iteration over the banded MinHash pair relation on the same
    * fixture) — the power iteration itself is the small term, and
    * tools.StressFixture's pagerank_banded arm measures exactly that by
    * swapping the edge source. */
  private[operators] def fullRanksFrom(pairRel: DataFrame): DataFrame = {
    // checkpoint BEFORE the both-directions union: the union's two
    // branches are two consumers of the expensive pair subtree
    val pairs = pairRel
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint(true)
    val edges = pairs
      .unionByName(pairs.select(col("doc_b").as("doc_a"),
        col("doc_a").as("doc_b")))
      .localCheckpoint(true)
    val deg = edges.groupBy(col("doc_a")).agg(count(lit(1)).as("deg"))
    val n = deg.count()
    // loop-INVARIANT join hoist (r16): edges ⋈ deg never changes across
    // rounds, yet inside the loop Spark re-derived it per iteration —
    // 5 joins (and their exchanges) for one relation. Materialize it
    // once, pre-partitioned on the join key, so each round only the
    // rank vector moves: small-scale the planner broadcasts the rank
    // side (no edge exchange at all), large-scale the SMJ/SHJ reuses
    // the checkpointed HashPartitioning(doc_a) instead of re-shuffling
    // the edge relation every round.
    // EXPLICIT width (ADVICE r16): a numberless keyed repartition is
    // AQE-byte-coalesced to ~1 partition at small sizes and the eager
    // checkpoint would freeze that serial layout for all 5 iterations —
    // the same pcaFit/lshBucketRel lesson
    val edgesW = edges.join(deg, Seq("doc_a"))
      .select(col("doc_a"), col("doc_b"), col("deg"))
      .repartition(pairRel.sparkSession.sparkContext.defaultParallelism,
        col("doc_a"))
      .localCheckpoint(true)
    var ranks = deg.select(col("doc_a").as("doc_id"),
      lit(1.0 / n).as("pr"))
    for (_ <- 1 to iters) {
      ranks = edgesW
        .join(ranks, edgesW("doc_a") === ranks("doc_id"))
        .select(col("doc_b").as("doc_id"), (col("pr") / col("deg"))
          .as("m"))
        .groupBy(col("doc_id"))
        .agg(sum(col("m")).as("msum"))
        .select(col("doc_id"),
          (lit((1.0 - d) / n) + lit(d) * col("msum")).as("pr"))
        .localCheckpoint(true)
    }
    ranks.join(deg.select(col("doc_a").as("doc_id"), col("deg")),
        Seq("doc_id"))
  }

  def pagerankNearDup(s: SparkSession, dir: String): DataFrame =
    fullRanks(s, dir)
      .select(col("doc_id"), col("deg"), round(col("pr"), 6)
        .as("pagerank"))
      .orderBy(col("pagerank").desc, col("doc_id"))
      .limit(30)

  val pagerankNearDupSql: String = {
    def iterCte(r: Int): String =
      s"""r$r AS (
         |  SELECT e.doc_b AS doc_id,
         |         (1.0 - $d) / (SELECT n FROM nn) +
         |           $d * sum(p.pr / dg.deg) AS pr
         |  FROM edges e
         |  JOIN deg dg ON e.doc_a = dg.doc_a
         |  JOIN r${r - 1} p ON e.doc_a = p.doc_id
         |  GROUP BY e.doc_b)""".stripMargin
    s"""WITH w AS (SELECT doc_id, source,
       |  list_distinct(string_split(text, ' ')) AS w FROM documents),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM w a JOIN w b ON a.source = b.source AND a.doc_id < b.doc_id
       |  WHERE CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
       |      / len(list_distinct(list_concat(a.w, b.w))) >= 0.7),
       |edges AS (SELECT doc_a, doc_b FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |deg AS (SELECT doc_a, count(*) AS deg FROM edges GROUP BY 1),
       |nn AS (SELECT count(*) AS n FROM deg),
       |r0 AS (SELECT doc_a AS doc_id, 1.0 / (SELECT n FROM nn) AS pr
       |       FROM deg),
       |${(1 to iters).map(iterCte).mkString(",\n")}
       |SELECT r.doc_id, CAST(dg.deg AS BIGINT) AS deg,
       |       round(r.pr, 6) AS pagerank
       |FROM r$iters r JOIN deg dg ON r.doc_id = dg.doc_a
       |ORDER BY pagerank DESC, doc_id LIMIT 30""".stripMargin
  }

  /** Per-node triangle count + local clustering coefficient over the
    * same near-dup graph — the second classic graph-analytics shape
    * (motif counting): high clustering marks TEMPLATED near-dup regions
    * (every copy similar to every other copy), low clustering marks
    * chain-shaped drift, which is the curation signal for "cluster and
    * keep one" vs "review the chain".
    *
    * Algorithm: degree-ordered edge orientation (Suri–Vassilvitskii /
    * Cohen MapReduce triangle counting) — orient every edge from the
    * (degree, id)-smaller endpoint to the larger, enumerate wedges only
    * at each edge's SOURCE, and close them against the oriented edge
    * set. Each triangle is emitted exactly once, and the per-node wedge
    * fan-out is bounded by O(sqrt(m)) instead of the max degree — the
    * difference between a hub node generating deg² wedge candidates and
    * the orientation's provable bound. All joins shuffle on node keys;
    * nothing global, nothing driver-side. */
  def triangleCount(s: SparkSession, dir: String): DataFrame = {
    // materialize the pair generation once: the word self-join is the
    // expensive subtree and the plan below consumes pairs/edges from
    // SIX positions — un-checkpointed, Spark re-derives it per consumer
    // (the pagerank/CC precedent; plans/triangle_count.txt before/after)
    // banded candidate pairs (r16): the measured 30x slope here was
    // ~entirely the exact pair derivation (scaladoc above); the graph
    // math never reads the jaccard value, and the exact SQL oracle
    // stands under the dedup family's recorded band-miss waiver
    val pairs = DedupQueries.bandedPairs(s, dir)
      .localCheckpoint(true)
    val deg = pairs.select(col("doc_a").as("node"))
      .unionByName(pairs.select(col("doc_b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // orient a<b edges by (deg, id); a<b already, so equal degrees keep
    // the a->b direction
    val e = pairs
      .join(deg.select(col("node").as("doc_a"), col("deg").as("da")),
        "doc_a")
      .join(deg.select(col("node").as("doc_b"), col("deg").as("db")),
        "doc_b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("doc_a") < col("doc_b")),
          struct(col("doc_a").as("src"), col("doc_b").as("dst"),
            col("db").as("dd")))
          .otherwise(struct(col("doc_b").as("src"), col("doc_a").as("dst"),
            col("da").as("dd"))).as("e"))
      .select(col("e.src"), col("e.dst"), col("e.dd"))
      .localCheckpoint(true)
    // wedges at the source, dst1 < dst2 under the SAME (deg, id) order,
    // closed against the oriented edges
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.src") === col("e2.src") &&
        (col("e1.dd") < col("e2.dd") ||
          (col("e1.dd") === col("e2.dd") &&
            col("e1.dst") < col("e2.dst"))))
      .select(col("e1.src").as("u"), col("e1.dst").as("v"),
        col("e2.dst").as("w"))
      .join(e.select(col("src").as("v"), col("dst").as("w")),
        Seq("v", "w"))
    val perNode = tri
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node").as("doc_id"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("clustering",
        when(col("deg") > 1,
          round(lit(2.0) * col("n_tri") /
            (col("deg") * (col("deg") - 1)), 6))
          .otherwise(lit(0.0)))
      .orderBy(col("doc_id"))
  }

  val triangleCountSql: String =
    """WITH w AS (SELECT doc_id, source,
      |  list_distinct(string_split(text, ' ')) AS w FROM documents),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM w a JOIN w b ON a.source = b.source AND a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
      |      / len(list_distinct(list_concat(a.w, b.w))) >= 0.7),
      |und AS (SELECT doc_a AS node FROM pairs
      |        UNION ALL SELECT doc_b FROM pairs),
      |deg AS (SELECT node, count(*) AS deg FROM und GROUP BY 1),
      |e AS (
      |  SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg) THEN doc_a
      |              ELSE doc_b END AS src,
      |         CASE WHEN da.deg < db.deg OR (da.deg = db.deg) THEN doc_b
      |              ELSE doc_a END AS dst,
      |         CASE WHEN da.deg < db.deg OR (da.deg = db.deg) THEN db.deg
      |              ELSE da.deg END AS dd
      |  FROM pairs
      |  JOIN deg da ON doc_a = da.node
      |  JOIN deg db ON doc_b = db.node),
      |tri AS (
      |  SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
      |  FROM e e1
      |  JOIN e e2 ON e1.src = e2.src
      |    AND (e1.dd < e2.dd OR (e1.dd = e2.dd AND e1.dst < e2.dst))
      |  JOIN e e3 ON e3.src = e1.dst AND e3.dst = e2.dst),
      |pn AS (
      |  SELECT node, count(*) AS n_tri FROM (
      |    SELECT u AS node FROM tri
      |    UNION ALL SELECT v FROM tri
      |    UNION ALL SELECT w FROM tri)
      |  GROUP BY node)
      |SELECT deg.node AS doc_id, CAST(deg.deg AS BIGINT) AS deg,
      |       CAST(coalesce(pn.n_tri, 0) AS BIGINT) AS n_tri,
      |       CASE WHEN deg.deg > 1
      |            THEN round(2.0 * coalesce(pn.n_tri, 0)
      |                   / (deg.deg * (deg.deg - 1)), 6)
      |            ELSE 0.0 END AS clustering
      |FROM deg LEFT JOIN pn ON deg.node = pn.node
      |ORDER BY doc_id""".stripMargin

  private val coreK = 3
  private val coreRounds = 8

  /** k-core decomposition (k = 3) of the near-dup graph by iterative
    * peeling: repeatedly delete nodes of degree < k until fixpoint — the
    * surviving 3-core is the DENSE template region (every member has ≥3
    * near-dup partners inside the core), the strongest "cluster and keep
    * one" signal the pair graph offers, one notch above triangle
    * counting's local view.
    *
    * Peeling is the same bounded-iteration dataflow as the CC
    * contraction: per round one degree aggregation + two semi-joins
    * (both shuffling on node keys only), `localCheckpoint` so lineage
    * stays O(1). Peeling halves-or-better the remaining graph most
    * rounds; [[coreRounds]] = 8 is a measured-fixpoint bound at the test
    * SFs and the spec asserts an extra round changes nothing — the same
    * bounded-unrolling contract as the oracle's unrolled CTE chain. */
  def kCore(s: SparkSession, dir: String): DataFrame = {
    // banded candidate pairs (r16): the measured 30x slope here was
    // ~entirely the exact pair derivation (scaladoc above); the graph
    // math never reads the jaccard value, and the exact SQL oracle
    // stands under the dedup family's recorded band-miss waiver
    val pairs = DedupQueries.bandedPairs(s, dir)
      .localCheckpoint(true)
    var edges = pairs
      .unionByName(pairs.select(col("doc_b").as("doc_a"),
        col("doc_a").as("doc_b")))
      .localCheckpoint(true)
    // fixpoint short-circuit (r16, the zero-discovery precedent): the
    // peeling semi-joins only REMOVE edges, so an unchanged edge count
    // after a round means keep contained every remaining endpoint and
    // all later rounds are the identity — skipping them is exact. The
    // count per executed round is one tiny job over the already-
    // materialized checkpoint; the oracle's unrolled 8-round CTE chain
    // reaches the same fixpoint by the same argument.
    var m = edges.count()
    var converged = false
    for (_ <- 1 to coreRounds if !converged) {
      val keep = edges.groupBy(col("doc_a")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= coreK).select(col("doc_a"))
      edges = edges
        .join(keep, Seq("doc_a"), "left_semi")
        .join(keep.select(col("doc_a").as("doc_b")), Seq("doc_b"),
          "left_semi")
        .localCheckpoint(true)
      val m2 = edges.count()
      converged = m2 == m
      m = m2
    }
    edges.groupBy(col("doc_a")).agg(count(lit(1)).as("core_deg"))
      .select(col("doc_a").as("doc_id"), col("core_deg"))
      .orderBy(col("doc_id"))
  }

  val kCoreSql: String = {
    // MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and each
    // round references the previous one three times — un-materialized,
    // the unrolled chain expands 3^rounds copies of the pair join
    // (observed: fd exhaustion before the first row)
    def round(r: Int): String =
      s"""k$r AS MATERIALIZED (SELECT doc_a FROM e${r - 1} GROUP BY doc_a
         |        HAVING count(*) >= $coreK),
         |e$r AS MATERIALIZED (
         |  SELECT e.doc_a, e.doc_b FROM e${r - 1} e
         |  JOIN k$r a ON e.doc_a = a.doc_a
         |  JOIN k$r b ON e.doc_b = b.doc_a)""".stripMargin
    s"""WITH w AS (SELECT doc_id, source,
       |  list_distinct(string_split(text, ' ')) AS w FROM documents),
       |pairs AS MATERIALIZED (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM w a JOIN w b ON a.source = b.source AND a.doc_id < b.doc_id
       |  WHERE CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
       |      / len(list_distinct(list_concat(a.w, b.w))) >= 0.7),
       |e0 AS MATERIALIZED (SELECT doc_a, doc_b FROM pairs
       |       UNION ALL SELECT doc_b, doc_a FROM pairs),
       |${(1 to coreRounds).map(round).mkString(",\n")}
       |SELECT doc_a AS doc_id, CAST(count(*) AS BIGINT) AS core_deg
       |FROM e$coreRounds GROUP BY doc_a ORDER BY doc_id""".stripMargin
  }

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(
      ("pagerank_neardup", pagerankNearDup _, Some(pagerankNearDupSql)),
      ("triangle_count", triangleCount _, Some(triangleCountSql)),
      ("k_core", kCore _, Some(kCoreSql)))
}
