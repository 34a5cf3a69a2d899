package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Data-quality profiling and robust-statistics operators — the
  * "know your corpus before you train on it" primitives (the
  * Deequ/profiler class): a one-pass per-column profile relation and a
  * per-group winsorization (percentile clipping) pass.
  *
  * Both are pure aggregation shapes: map-side partial aggregates into a
  * tiny output relation, nothing driver-side, nothing all-pairs.
  */
object ProfileQueries {

  /** (name, kind) for every lineitem column; kind drives the portable
    * string rendering of min/max (a raw CAST of DOUBLE differs between
    * engines on scientific-notation thresholds; %.6f / a zero-padded
    * microsecond format are bit-stable on both). */
  private val liCols: Seq[(String, String)] = Seq(
    "l_orderkey" -> "int", "l_partkey" -> "int", "l_suppkey" -> "int",
    "l_linenumber" -> "int", "l_quantity" -> "dbl",
    "l_extendedprice" -> "dbl", "l_discount" -> "dbl", "l_tax" -> "dbl",
    "l_returnflag" -> "str", "l_linestatus" -> "str",
    "l_shipdate" -> "ts")

  private def repr(c: Column, kind: String): Column = kind match {
    case "dbl" => format_string("%.6f", c)
    case "ts"  => date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
    case _     => c.cast("string")
  }

  /** Per-column profile of `lineitem`: row count, null count, exact
    * distinct count, min/max rendered portably.
    *
    * Plan shape, chosen by measurement: the algebraic stats (count /
    * nulls / min / max) come from ONE aggregation over the table and an
    * in-row unpivot; the exact distinct counts come from ELEVEN
    * independent single-column 2-phase aggregates (each a
    * column-pruned scan + partial distinct), unioned and joined back on
    * col_name. The tempting single-statement form — eleven
    * `count(DISTINCT)` in one agg — makes Catalyst Expand every row
    * ×11 through one shuffle whose keys are the union of all column
    * domains: measured 28.2 s at sf0.1 vs ~3 s for this shape. Per
    * column the pruned scan reads only that column's pages, and the
    * partial distinct combines map-side.
    *
    * Scale: exact per-column distincts are the oracle-exact
    * formulation; at 100 TB swap them for `approx_count_distinct`,
    * which collapses the whole profile back to a true single scan. The
    * reference profiles its metadata the same way before set-making
    * (`main/metadata_set_maker.py` nunique/value_counts passes). */
  def columnProfile(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val aggs: Seq[Column] = Seq(count(lit(1)).as("n_rows")) ++
      liCols.flatMap { case (c, _) =>
        Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
          min(col(c)).as(s"mn_$c"),
          max(col(c)).as(s"mx_$c"))
      }
    val one = li.agg(aggs.head, aggs.tail: _*)
    val rows = array(liCols.map { case (c, k) =>
      struct(
        lit(c).as("col_name"),
        col("n_rows"),
        col(s"nn_$c").as("n_null"),
        repr(col(s"mn_$c"), k).as("min_repr"),
        repr(col(s"mx_$c"), k).as("max_repr"))
    }: _*)
    val stats = one.select(explode(rows).as("p")).select(col("p.*"))
    val dcounts = liCols.map { case (c, _) =>
      li.agg(count_distinct(col(c)).as("n_distinct"))
        .select(lit(c).as("col_name"), col("n_distinct"))
    }.reduce(_ unionByName _)
    stats.join(dcounts, Seq("col_name"))
      .select(col("col_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_repr"), col("max_repr"))
      .orderBy(col("col_name"))
  }

  val columnProfileSql: String = {
    val selects = liCols.map { case (c, k) =>
      val (mn, mx) = k match {
        case "dbl" => (s"printf('%.6f', min($c))", s"printf('%.6f', max($c))")
        case "ts" => (s"strftime(min($c), '%Y-%m-%d %H:%M:%S.%f')",
          s"strftime(max($c), '%Y-%m-%d %H:%M:%S.%f')")
        case _ => (s"CAST(min($c) AS VARCHAR)", s"CAST(max($c) AS VARCHAR)")
      }
      s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_null,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  $mn AS min_repr, $mx AS max_repr
         |FROM lineitem""".stripMargin
    }
    selects.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** Per-group winsorization: clip `l_extendedprice` to its group's
    * [p05, p95] and report the bounds, clip counts, and winsorized mean
    * — the robust-stats guard every quality-score distribution gets
    * before thresholding (outlier documents would otherwise set the
    * scale).
    *
    * Percentiles are DISCRETE (type-1: the ceil(p·n)-th order statistic
    * under the total order (price, orderkey, linenumber)) and the ranks
    * are integer arithmetic (`(n+19) div 20`) — so the bounds are actual
    * data values, bit-identical cross-engine, and the clip COUNTS are
    * exact integers (an interpolated percentile would put the boundary a
    * float-ulp away from agreement). One window shuffle on the group key
    * + one aggregation.
    *
    * Scale: with a handful of giant groups the per-group sort is the
    * honest cost of EXACT order statistics; at 100 TB the standard swap
    * is `approx_percentile` cut points (one pass, no window, clip counts
    * then approximate) or a two-round distributed selection — the
    * downstream clip + mean stays identical. */
  def winsorize(s: SparkSession, dir: String): DataFrame = {
    val byFlag = Window.partitionBy(col("l_returnflag"))
    val w = byFlag.orderBy(col("p"), col("l_orderkey"),
      col("l_linenumber"))
    val r = Tables(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice").as("p"),
        col("l_orderkey"), col("l_linenumber"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(byFlag))
    val bounds = r
      .withColumn("klo", expr("(n + 19) div 20"))
      .withColumn("khi", expr("(19 * n + 19) div 20"))
      .filter(col("rn") === col("klo") || col("rn") === col("khi"))
      .groupBy(col("l_returnflag"))
      .agg(min(when(col("rn") === col("klo"), col("p"))).as("p05"),
        min(when(col("rn") === col("khi"), col("p"))).as("p95"))
    r.join(broadcast(bounds), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        min(col("p05")).as("p05"), min(col("p95")).as("p95"),
        sum(when(col("p") < col("p05"), 1L).otherwise(0L)).as("n_clip_lo"),
        sum(when(col("p") > col("p95"), 1L).otherwise(0L)).as("n_clip_hi"),
        round(avg(least(greatest(col("p"), col("p05")), col("p95"))), 6)
          .as("win_mean"))
      .orderBy(col("l_returnflag"))
  }

  val winsorizeSql: String =
    """WITH r AS (
      |  SELECT l_returnflag, l_extendedprice AS p,
      |         row_number() OVER w AS rn,
      |         count(*) OVER (PARTITION BY l_returnflag) AS n
      |  FROM lineitem
      |  WINDOW w AS (PARTITION BY l_returnflag
      |    ORDER BY l_extendedprice, l_orderkey, l_linenumber)),
      |b AS (
      |  SELECT l_returnflag,
      |         min(CASE WHEN rn = (n + 19) // 20 THEN p END) AS p05,
      |         min(CASE WHEN rn = (19 * n + 19) // 20 THEN p END) AS p95
      |  FROM r GROUP BY l_returnflag)
      |SELECT r.l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |       min(b.p05) AS p05, min(b.p95) AS p95,
      |       CAST(sum(CASE WHEN p < b.p05 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_clip_lo,
      |       CAST(sum(CASE WHEN p > b.p95 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_clip_hi,
      |       round(avg(least(greatest(p, b.p05), b.p95)), 6) AS win_mean
      |FROM r JOIN b USING (l_returnflag)
      |GROUP BY r.l_returnflag ORDER BY r.l_returnflag""".stripMargin

  /** Equi-width histogram of `l_extendedprice` per group, 20 buckets —
    * the distribution-shape primitive behind drift monitors and quality
    * dashboards. Unlike equi-DEPTH binning (a per-group sort — see
    * [[winsorize]]'s rank machinery), equi-width is fully map-side once
    * the per-group min/max broadcast: bucket assignment is one
    * arithmetic expression inside whole-stage codegen, so the operator
    * is a scan + two tiny shuffles at ANY scale.
    *
    * The bucket expression is written identically on both engines —
    * `floor((p - mn) * 20.0 / (mx - mn))` — so IEEE evaluation order
    * matches and edge-straddling values land in the same bucket
    * bit-for-bit. */
  def equiwidthHist(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice").as("p"))
    val bounds = li.groupBy(col("l_returnflag"))
      .agg(min(col("p")).as("mn"), max(col("p")).as("mx"))
    li.join(broadcast(bounds), Seq("l_returnflag"))
      // degenerate-group guard: a constant-valued group gives 0/0 = NaN,
      // where the engines diverge (Spark casts NaN to 0, DuckDB errors
      // on CAST) — route width-0 groups to bucket 0 explicitly
      .withColumn("bucket",
        when(col("mx") > col("mn"),
          least(floor((col("p") - col("mn")) * lit(20.0) /
            (col("mx") - col("mn"))).cast("int"), lit(19)))
          .otherwise(lit(0)))
      .groupBy(col("l_returnflag"), col("bucket"))
      .agg(count(lit(1)).as("n"), round(avg(col("p")), 6).as("avg_p"),
        min(col("mn")).as("mn"), min(col("mx")).as("mx"))
      .withColumn("bucket_lo",
        round(col("mn") + col("bucket") * (col("mx") - col("mn")) / 20.0,
          6))
      .select(col("l_returnflag"), col("bucket"), col("bucket_lo"),
        col("n"), col("avg_p"))
      .orderBy(col("l_returnflag"), col("bucket"))
  }

  val equiwidthHistSql: String =
    """WITH b AS (
      |  SELECT l_returnflag, min(l_extendedprice) AS mn,
      |         max(l_extendedprice) AS mx
      |  FROM lineitem GROUP BY 1),
      |h AS (
      |  SELECT l.l_returnflag,
      |         CASE WHEN b.mx > b.mn
      |              THEN least(CAST(floor((l.l_extendedprice - b.mn)
      |                     * 20.0 / (b.mx - b.mn)) AS INT), 19)
      |              ELSE 0 END AS bucket,
      |         l.l_extendedprice AS p, b.mn, b.mx
      |  FROM lineitem l JOIN b USING (l_returnflag))
      |SELECT l_returnflag, bucket,
      |       round(min(mn) + bucket * (min(mx) - min(mn)) / 20.0, 6)
      |         AS bucket_lo,
      |       CAST(count(*) AS BIGINT) AS n, round(avg(p), 6) AS avg_p
      |FROM h GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Declarative data-quality rule audit (the Deequ/dbt-test class):
    * each rule is a violation predicate over `lineitem`; the relation
    * reports, per rule, rows checked, violations, the violation rate
    * and the smallest violating order key (the "show me one" handle).
    * A rule with zero violations stays in the output — a PASSING
    * constraint is evidence too.
    *
    * ALL rules evaluate in ONE aggregation pass (conditional sums are
    * algebraic — map-side combined, no Expand, no per-rule scan), then
    * an in-row unpivot emits the per-rule relation: the audit costs one
    * scan no matter how many rules, which is what makes a 100-rule
    * suite viable at 100 TB. */
  private[operators] val dqRuleSet: Seq[(String, Column)] = Seq(
    "discount_le_008" -> (col("l_discount") > 0.08),
    "flag_in_anr" -> !col("l_returnflag").isin("A", "N", "R"),
    "price_lt_100k" -> (col("l_extendedprice") >= 100000.0),
    "quantity_le_45" -> (col("l_quantity") > 45.0),
    "shipdate_lt_2001" ->
      (col("l_shipdate") >= lit("2001-01-01").cast("timestamp")))

  /** One-row rule counters over any lineitem-shaped relation — every
    * counter is mergeable (sums and a min), which is what the streaming
    * twin [[StreamingDqQueries]] folds per batch. */
  private[operators] def dqAgg(df: DataFrame): DataFrame = {
    val aggs: Seq[Column] = Seq(count(lit(1)).as("n_checked")) ++
      dqRuleSet.flatMap { case (n, cond) =>
        Seq(sum(when(cond, 1L).otherwise(0L)).as(s"v_$n"),
          min(when(cond, col("l_orderkey"))).as(s"k_$n"))
      }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** In-row unpivot of the one-row counters into the per-rule
    * relation — shared verbatim by batch and stream. */
  private[operators] def dqUnpivot(one: DataFrame): DataFrame = {
    val rows = array(dqRuleSet.map { case (n, _) =>
      struct(lit(n).as("rule"), col("n_checked"),
        col(s"v_$n").as("n_violations"),
        (col(s"v_$n").cast("double") / col("n_checked"))
          .as("violation_rate"),
        col(s"k_$n").as("first_bad_key"))
    }: _*)
    one.select(explode(rows).as("r")).select(col("r.*"))
      .orderBy(col("rule"))
  }

  def dqRules(s: SparkSession, dir: String): DataFrame =
    dqUnpivot(dqAgg(Tables(s, dir, "lineitem")))

  val dqRulesSql: String =
    """WITH a AS (
      |  SELECT count(*) AS n_checked,
      |    sum(CASE WHEN l_discount > 0.08 THEN 1 ELSE 0 END) AS v1,
      |    min(CASE WHEN l_discount > 0.08 THEN l_orderkey END) AS k1,
      |    sum(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0
      |        END) AS v2,
      |    min(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN l_orderkey
      |        END) AS k2,
      |    sum(CASE WHEN l_extendedprice >= 100000.0 THEN 1 ELSE 0 END)
      |      AS v3,
      |    min(CASE WHEN l_extendedprice >= 100000.0 THEN l_orderkey END)
      |      AS k3,
      |    sum(CASE WHEN l_quantity > 45.0 THEN 1 ELSE 0 END) AS v4,
      |    min(CASE WHEN l_quantity > 45.0 THEN l_orderkey END) AS k4,
      |    sum(CASE WHEN l_shipdate >= TIMESTAMP '2001-01-01' THEN 1
      |        ELSE 0 END) AS v5,
      |    min(CASE WHEN l_shipdate >= TIMESTAMP '2001-01-01'
      |        THEN l_orderkey END) AS k5
      |  FROM lineitem)
      |SELECT rule, CAST(n_checked AS BIGINT) AS n_checked,
      |       CAST(nv AS BIGINT) AS n_violations,
      |       CAST(nv AS DOUBLE) / n_checked AS violation_rate,
      |       kk AS first_bad_key
      |FROM (
      |  SELECT 'discount_le_008' AS rule, n_checked, v1 AS nv, k1 AS kk
      |    FROM a
      |  UNION ALL SELECT 'flag_in_anr', n_checked, v2, k2 FROM a
      |  UNION ALL SELECT 'price_lt_100k', n_checked, v3, k3 FROM a
      |  UNION ALL SELECT 'quantity_le_45', n_checked, v4, k4 FROM a
      |  UNION ALL SELECT 'shipdate_lt_2001', n_checked, v5, k5 FROM a)
      |ORDER BY rule""".stripMargin

  /** Equi-DEPTH binning (deciles) per group — the feature-discretizer
    * twin of [[equiwidthHist]]: `ntile(10)` under the same total order
    * as [[winsorize]] assigns exactly-even bucket populations (earlier
    * tiles absorb remainders — identical semantics on both engines), so
    * bucket boundaries ARE data values and counts are integer-exact.
    * Same scale posture as winsorize: exact rank assignment is a
    * per-group sort; at 100 TB swap for approx_percentile cut points
    * and a map-side bucket expression (the equiwidthHist shape). */
  def quantileBins(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("p"), col("l_orderkey"), col("l_linenumber"))
    Tables(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice").as("p"),
        col("l_orderkey"), col("l_linenumber"))
      .withColumn("tile", ntile(10).over(w))
      .groupBy(col("l_returnflag"), col("tile"))
      .agg(count(lit(1)).as("n"), min(col("p")).as("lo"),
        max(col("p")).as("hi"), round(avg(col("p")), 6).as("avg_p"))
      .orderBy(col("l_returnflag"), col("tile"))
  }

  val quantileBinsSql: String =
    """WITH t AS (
      |  SELECT l_returnflag, l_extendedprice AS p,
      |         ntile(10) OVER (PARTITION BY l_returnflag
      |           ORDER BY l_extendedprice, l_orderkey, l_linenumber)
      |           AS tile
      |  FROM lineitem)
      |SELECT l_returnflag, CAST(tile AS INT) AS tile,
      |       CAST(count(*) AS BIGINT) AS n, min(p) AS lo, max(p) AS hi,
      |       round(avg(p), 6) AS avg_p
      |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(
      ("column_profile", columnProfile _, Some(columnProfileSql)),
      ("winsorize", winsorize _, Some(winsorizeSql)),
      ("equiwidth_hist", equiwidthHist _, Some(equiwidthHistSql)),
      ("dq_rules", dqRules _, Some(dqRulesSql)),
      ("quantile_bins", quantileBins _, Some(quantileBinsSql)))
}
