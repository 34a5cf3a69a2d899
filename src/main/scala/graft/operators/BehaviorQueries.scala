package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Events

/** Behavioral/sequence analytics over the event stream — the funnel and
  * cohort-retention primitives every product-analytics engine ships
  * (ClickHouse `windowFunnel`/`retention`, Amplitude/Mixpanel cores) and
  * classic OLAP benchmarks lack. Both are pure relational compositions —
  * conditional min-aggregates and date arithmetic — so they hash-oracle
  * cross-engine with no custom state.
  *
  * Scale shape: both operators aggregate to per-user grain FIRST (one
  * map-side-combined shuffle on user_id — the natural partitioning key
  * of any event store), then join tiny per-user timestamps back to the
  * filtered event slices. Nothing is windowed over the raw stream; the
  * event scan is pruned to (user_id, event_type, ts) and filtered by
  * step type before any shuffle. At 100 TB with the store bucketed by
  * user_id the step joins are co-located and shuffle-free.
  */
object BehaviorQueries {

  /** Windowed funnel view → click → purchase: a user converts step k
    * only if the step-k event lands strictly after their step-(k−1)
    * conversion instant and within the 7-day window of it — the
    * ClickHouse `windowFunnel(strict_order-less)` semantics. Output is
    * one row per step with reached-user counts and conversion vs the
    * funnel head (int/int division — bit-identical cross-engine). */
  def funnelConversion(s: SparkSession, dir: String): DataFrame = {
    val ev = Events(s, dir).select(col("user_id"), col("event_type"),
      col("ts"))
    def step(prev: DataFrame, prevCol: String, typ: String,
        out: String): DataFrame =
      ev.filter(col("event_type") === typ)
        .join(prev, Seq("user_id"))
        .filter(col("ts") > col(prevCol) &&
          col("ts") <= col(prevCol) + expr("INTERVAL 7 DAYS"))
        .groupBy(col("user_id")).agg(min(col("ts")).as(out))
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val t2 = step(t1, "t1", "click", "t2")
    val t3 = step(t2.select("user_id", "t2"), "t2", "purchase", "t3")
    val u1 = t1.agg(count(lit(1)).as("u1"))
    val u2 = t2.agg(count(lit(1)).as("u2"))
    val u3 = t3.agg(count(lit(1)).as("u3"))
    u1.crossJoin(u2).crossJoin(u3)
      .select(explode(array(
        struct(lit("1_view").as("step"), col("u1").as("users")),
        struct(lit("2_click").as("step"), col("u2").as("users")),
        struct(lit("3_purchase").as("step"), col("u3").as("users")))
      ).as("r"), col("u1"))
      .select(col("r.step").as("step"), col("r.users").as("users"),
        (col("r.users").cast("double") / col("u1").cast("double"))
          .as("conv_rate"))
      .orderBy(col("step"))
  }

  val funnelConversionSql: String =
    """WITH t1 AS (SELECT user_id, min(ts) AS t1 FROM events
      |            WHERE event_type = 'view' GROUP BY user_id),
      |t2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      |       JOIN t1 ON e.user_id = t1.user_id
      |       WHERE e.event_type = 'click' AND e.ts > t1.t1
      |         AND e.ts <= t1.t1 + INTERVAL 7 DAY
      |       GROUP BY e.user_id),
      |t3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
      |       JOIN t2 ON e.user_id = t2.user_id
      |       WHERE e.event_type = 'purchase' AND e.ts > t2.t2
      |         AND e.ts <= t2.t2 + INTERVAL 7 DAY
      |       GROUP BY e.user_id),
      |u AS (SELECT (SELECT count(*) FROM t1) AS u1,
      |             (SELECT count(*) FROM t2) AS u2,
      |             (SELECT count(*) FROM t3) AS u3)
      |SELECT s.step, s.users,
      |       CAST(s.users AS DOUBLE) / CAST(u.u1 AS DOUBLE) AS conv_rate
      |FROM u, LATERAL (
      |  SELECT '1_view' AS step, CAST(u1 AS BIGINT) AS users UNION ALL
      |  SELECT '2_click', CAST(u2 AS BIGINT) UNION ALL
      |  SELECT '3_purchase', CAST(u3 AS BIGINT)) s
      |ORDER BY step""".stripMargin

  /** Daily cohort retention: cohort = a user's first active day; for
    * every (cohort, day-offset) cell, the distinct users still active —
    * the triangular retention matrix. Cohort dates surface as TIMESTAMP
    * (DATE-typed outputs compare messily across engines — house rule). */
  def retentionCohorts(s: SparkSession, dir: String): DataFrame = {
    val act = Events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val cohort = act.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort"))
    val sizes = cohort.groupBy(col("cohort"))
      .agg(count(lit(1)).as("cohort_size"))
    act.join(cohort, Seq("user_id"))
      .groupBy(col("cohort"), datediff(col("day"), col("cohort"))
        .cast("long").as("day_offset"))
      .agg(count(lit(1)).as("users"))
      .join(broadcast(sizes), Seq("cohort"))
      .select(col("cohort").cast("timestamp").as("cohort"),
        col("day_offset"), col("users"), col("cohort_size"),
        (col("users").cast("double") / col("cohort_size").cast("double"))
          .as("retention"))
      .orderBy(col("cohort"), col("day_offset"))
  }

  val retentionCohortsSql: String =
    """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
      |             FROM events),
      |cohort AS (SELECT user_id, min(day) AS cohort FROM act
      |           GROUP BY user_id),
      |sizes AS (SELECT cohort, count(*) AS cohort_size FROM cohort
      |          GROUP BY cohort)
      |SELECT CAST(a.cohort AS TIMESTAMP) AS cohort,
      |       CAST(date_diff('day', a.cohort, act.day) AS BIGINT) AS day_offset,
      |       CAST(count(*) AS BIGINT) AS users,
      |       CAST(any_value(s.cohort_size) AS BIGINT) AS cohort_size,
      |       CAST(count(*) AS DOUBLE) / any_value(s.cohort_size)
      |         AS retention
      |FROM act
      |JOIN cohort a ON act.user_id = a.user_id
      |JOIN sizes s ON s.cohort = a.cohort
      |GROUP BY a.cohort, date_diff('day', a.cohort, act.day)
      |ORDER BY cohort, day_offset""".stripMargin

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(
      ("funnel_conversion", funnelConversion _, Some(funnelConversionSql)),
      ("retention_cohorts", retentionCohorts _, Some(retentionCohortsSql)))
}
