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
  * Graph: the word-Jaccard ≥ 0.7 pairs ([[DedupQueries.jaccardPairs]])
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
  private[operators] def fullRanks(s: SparkSession, dir: String): DataFrame = {
    val pairs = DedupQueries.jaccardPairs(s, dir)
      .select(col("doc_a"), col("doc_b"))
    val edges = pairs
      .unionByName(pairs.select(col("doc_b").as("doc_a"),
        col("doc_a").as("doc_b")))
      .localCheckpoint(true)
    val deg = edges.groupBy(col("doc_a")).agg(count(lit(1)).as("deg"))
    val n = deg.count()
    var ranks = deg.select(col("doc_a").as("doc_id"),
      lit(1.0 / n).as("pr"))
    for (_ <- 1 to iters) {
      ranks = edges
        .join(deg, Seq("doc_a"))
        .join(ranks, edges("doc_a") === ranks("doc_id"))
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

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(("pagerank_neardup", pagerankNearDup _, Some(pagerankNearDupSql)))
}
