package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Mergeable-sketch operators: fixed-size summaries whose merge is
  * order-free, so they build map-side and combine in one tiny shuffle —
  * the only aggregation shape that stays O(1) memory per executor at
  * 100 TB.
  *
  * [[heavyHitters]] is the count–min sketch (Cormode & Muthukrishnan
  * 2005) demonstrated end to end as an ORACLED relation. Unlike most
  * sketches (HLL, KLL) the CMS estimate is a deterministic function of
  * the input multiset once the hash family is pinned: every counter is a
  * SUM of per-token counts (order-free, no floating point), and the
  * estimate is a min over `d` counters — so a second engine replaying
  * the same hashes reproduces the sketch bit-for-bit and the whole
  * operator hash-oracles, overestimates included. The hash family is the
  * house portable 60-bit hash (`conv(substr(md5(seed:token),1,15),16,10)`
  * ≡ DuckDB `('0x' || substr(md5(..),1,15))::BIGINT` — verified equal).
  *
  * Scale shape: token counting is one map-side-combined shuffle; the
  * sketch itself is `d×w` counters built FROM the aggregated counts
  * (linearity: summing per-token counts ≡ summing the raw stream) in a
  * second tiny aggregation; candidate estimation joins `d` rows per
  * candidate against the broadcast counter relation. At 100 TB the
  * candidate set comes from a per-partition Misra–Gries prepass and the
  * exact arm disappears; here the exact counts stay as the verification
  * arm, so the relation itself PROVES the sketch's one-sided error
  * (`overest >= 0`, always — a spec gate) on real data. The width is
  * deliberately tiny (w=16 for a 31-token vocabulary) so collisions —
  * and the min-over-rows recovery — are actually exercised.
  */
object SketchQueries {

  private val depth = 4 // d hash rows: P(all d collide) decays as δ^d
  private val width = 16 // w counters/row: deliberately < vocab (see doc)
  private val topK = 30

  /** Portable 60-bit hash of `seed:token`, mod [[width]]. */
  private def bucket(seed: Int, token: Column): Column =
    conv(substring(md5(concat_ws(":", lit(seed), token)), 1, 15), 16, 10)
      .cast("long") % width

  /** Per-token counts of a document relation — the sketch's input grain.
    * Shared with [[StreamingSketchQueries]], whose per-batch partials are
    * exactly this over one batch (sum-mergeable by linearity). */
  private[operators] def tokenCounts(d: DataFrame): DataFrame =
    d.select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token")).agg(count(lit(1)).as("exact_cnt"))

  /** d×w counter grid from a (token, exact_cnt) relation: per
    * (seed, bucket) sum of hashing tokens' counts. Built from the
    * AGGREGATED relation — the raw stream never feeds the sketch twice —
    * and small enough (d·w = 64 cells) to broadcast. */
  private[operators] def counterGrid(counts: DataFrame): DataFrame =
    counts
      .select(col("exact_cnt"), explode(array((0 until depth).map(i =>
        struct(lit(i).as("seed"), bucket(i, col("token")).as("bucket"))
      ): _*)).as("e"))
      .groupBy(col("e.seed").as("seed"), col("e.bucket").as("bucket"))
      .agg(sum(col("exact_cnt")).as("c"))

  /** Top-k estimate relation from final counts + a (possibly re-merged)
    * counter grid — the single code path both the batch query and the
    * streaming twin end in, so their estimates are bit-identical. */
  private[operators] def estimates(counts: DataFrame,
      counters: DataFrame): DataFrame = {
    // top-k candidates by exact count (deterministic tie-break on token):
    // orderBy+limit plans as TakeOrderedAndProject — per-partition heaps,
    // no global sort, the right top-k shape at any scale
    val cand = counts.orderBy(col("exact_cnt").desc, col("token"))
      .limit(topK)
    cand
      .select(col("token"), col("exact_cnt"),
        explode(array((0 until depth).map(i =>
          struct(lit(i).as("seed"), bucket(i, col("token")).as("bucket"))
        ): _*)).as("e"))
      .join(broadcast(counters),
        col("e.seed") === col("seed") && col("e.bucket") === col("bucket"))
      .groupBy(col("token"), col("exact_cnt"))
      .agg(min(col("c")).as("cms_est"))
      .select(col("token"), col("exact_cnt"), col("cms_est"),
        (col("cms_est") - col("exact_cnt")).as("overest"))
      .orderBy(col("exact_cnt").desc, col("token"))
  }

  def heavyHitters(s: SparkSession, dir: String): DataFrame = {
    val counts = tokenCounts(Tables(s, dir, "documents"))
    estimates(counts, counterGrid(counts))
  }

  private def bucketSql(seed: Int, token: String): String =
    s"CAST(('0x' || substr(md5($seed || ':' || $token), 1, 15)) AS BIGINT)" +
      s" % $width"

  val heavyHittersSql: String = {
    val cells = (0 until depth)
      .map(i => s"SELECT $i AS seed, ${bucketSql(i, "token")} AS bucket")
      .mkString(" UNION ALL ")
    s"""WITH counts AS (
       |  SELECT token, count(*) AS exact_cnt FROM (
       |    SELECT unnest(string_split(text, ' ')) AS token FROM documents)
       |  WHERE len(token) > 0 GROUP BY token),
       |cells AS (SELECT c.token, c.exact_cnt, h.seed, h.bucket
       |          FROM counts c, LATERAL ($cells) h),
       |counters AS (SELECT seed, bucket, sum(exact_cnt) AS c
       |             FROM cells GROUP BY 1, 2),
       |cand AS (SELECT token, exact_cnt FROM counts
       |         ORDER BY exact_cnt DESC, token LIMIT $topK)
       |SELECT x.token, x.exact_cnt, CAST(min(k.c) AS BIGINT) AS cms_est,
       |       CAST(min(k.c) - x.exact_cnt AS BIGINT) AS overest
       |FROM (SELECT c.token, c.exact_cnt, h.seed, h.bucket
       |      FROM cand c, LATERAL ($cells) h) x
       |JOIN counters k ON x.seed = k.seed AND x.bucket = k.bucket
       |GROUP BY x.token, x.exact_cnt
       |ORDER BY exact_cnt DESC, token""".stripMargin
  }

  /** Heavy hitters through the [[graft.functions.MisraGriesAgg]]
    * TypedImperativeAggregate — the custom-UDAF rung of the extension
    * ladder exercised end to end (initialize/update/MERGE/serialize
    * across real partition boundaries; the input is deliberately left at
    * token grain, NOT pre-aggregated, so every executor merge path
    * runs). Per source, k = 64 counters over a ≤ ~31-word vocabulary —
    * the EXACT regime, where no decrement can fire under any
    * update/merge order and the estimates equal the true counts, which
    * is what lets DuckDB's plain GROUP BY be the oracle. The sub-k
    * approximation regime is merge-order-dependent by construction; its
    * L1 bounds are gated in MisraGriesSpec instead. */
  def heavyHittersMg(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.MisraGries.misraGries
    Tables(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("source"))
      .agg(misraGries(col("w"), 64).as("hh"))
      .select(col("source"), explode(col("hh")).as("e"))
      .select(col("source"), col("e.value").as("word"),
        col("e.cnt").as("cnt"))
      .orderBy(col("source"), col("word"))
  }

  val heavyHittersMgSql: String =
    """SELECT source, w AS word, CAST(count(*) AS BIGINT) AS cnt
      |FROM (SELECT source, unnest(string_split(text, ' ')) AS w
      |      FROM documents)
      |WHERE len(w) > 0
      |GROUP BY source, w
      |ORDER BY source, word""".stripMargin

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(
      ("heavy_hitters", heavyHitters _, Some(heavyHittersSql)),
      ("heavy_hitters_mg", heavyHittersMg _, Some(heavyHittersMgSql)))
}
