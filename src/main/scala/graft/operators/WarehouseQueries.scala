package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Events, Tables}

/** Warehouse history/sequence operators over the event feed: the SCD
  * type-2 dimension build, batch sessionization, and per-entity anomaly
  * scoring — the remaining classic warehouse patterns next to
  * `etl_merge_upsert` (latest-wins type-1) and the streaming session
  * window.
  *
  * All three are per-user window compositions: one shuffle on user_id
  * (the event store's natural key), then lag/lead change detection or a
  * per-user aggregate. Nothing global, nothing driver-side; at 100 TB
  * with the store bucketed by user_id the windows are sort-only
  * (no exchange), and AQE's skew split handles hot users.
  */
object WarehouseQueries {

  /** SCD type-2 dimension build: treat each user's event_type as their
    * current STATUS and reconstruct the full validity-interval history —
    * a new version opens only when the value CHANGES (consecutive equal
    * statuses collapse), `valid_to` is the next change instant, and the
    * last version per user is open-ended (null valid_to, is_current).
    * The standard type-2 semantics of every dimensional warehouse
    * (Kimball); `etl_merge_upsert` keeps only the latest row, this keeps
    * the queryable history.
    *
    * Deterministic order: (ts, event_id) — event ids are unique, so the
    * change detection and version numbering are total. */
  def scd2History(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val ev = Events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("status"))
      .withColumn("prev", lag(col("status"), 1).over(byUser))
      .filter(col("prev").isNull || col("prev") =!= col("status"))
    val byChange = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    ev.withColumn("version", row_number().over(byChange))
      .withColumn("valid_to", lead(col("ts"), 1).over(byChange))
      .select(col("user_id"), col("version"), col("status"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  val scd2HistorySql: String =
    """WITH ch AS (
      |  SELECT user_id, ts, event_id, event_type AS status,
      |         lag(event_type) OVER (PARTITION BY user_id
      |           ORDER BY ts, event_id) AS prev
      |  FROM events),
      |flt AS (SELECT * FROM ch WHERE prev IS NULL OR prev <> status)
      |SELECT user_id,
      |       CAST(row_number() OVER w AS INT) AS version,
      |       status, ts AS valid_from,
      |       lead(ts) OVER w AS valid_to,
      |       lead(ts) OVER w IS NULL AS is_current
      |FROM flt
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, version""".stripMargin

  /** Batch sessionization (gaps-and-islands): a session breaks on a
    * >30-minute silence; one row per session with its span and stats.
    * The batch twin of the streaming `session_window` query — same
    * semantics, stated as lag + a running sum of break flags, which is
    * how an event warehouse backfills sessions over history. */
  def eventSessionize(s: SparkSession, dir: String): DataFrame =
    sessionSpans(s, dir).orderBy(col("user_id"), col("session_seq"))

  /** The unordered session relation behind `event_sessionize` — shared
    * with [[RangeJoinQueries]] so the gaps-and-islands rule cannot drift
    * between the sessionizer and the joins that consume its intervals. */
  private[operators] def sessionSpans(s: SparkSession, dir: String)
      : DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val upTo = byUser.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    Events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      // unix_micros on BOTH sides (DuckDB: epoch_us): a seconds-grain
      // cast floors on Spark but keeps fractions in DuckDB's epoch(),
      // and a gap within 1s of the threshold would then flag differently
      .withColumn("brk",
        when(unix_micros(col("ts")) -
          lag(unix_micros(col("ts")), 1).over(byUser) > 1800000000L, 1L)
          .otherwise(lit(0L)))
      .withColumn("session_seq", sum(col("brk")).over(upTo))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("sum_value"))
  }

  val eventSessionizeSql: String =
    """WITH g AS (
      |  SELECT user_id, ts, value,
      |         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER
      |           (PARTITION BY user_id ORDER BY ts, event_id))
      |           > 1800000000 THEN 1 ELSE 0 END AS brk,
      |         event_id
      |  FROM events),
      |s AS (
      |  SELECT user_id, ts, value,
      |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           AS session_seq
      |  FROM g)
      |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
      |       min(ts) AS session_start, max(ts) AS session_end,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       round(sum(value), 6) AS sum_value
      |FROM s GROUP BY 1, 2 ORDER BY user_id, session_seq""".stripMargin

  /** Per-entity activity anomalies: each user's daily event count as a
    * z-score against their own mean/sd over active days, |z| ≥ 2
    * flagged. The sd is the MANUAL population form
    * sqrt(max(Σc²/n − μ², 0)) — the house parity idiom (emb_centroids):
    * built-in stddev implementations differ across engines (Welford vs
    * naive) at the last ulp, the explicit formula over exact integer
    * sums does not. Zero-sd users (perfectly regular) get z = 0. */
  def anomalyZscore(s: SparkSession, dir: String): DataFrame = {
    val daily = Events(s, dir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val stats = daily.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("cnt")).as("sc"),
        sum(col("cnt") * col("cnt")).as("sc2"))
      .withColumn("mu", col("sc").cast("double") / col("n_days"))
      .withColumn("sd", sqrt(greatest(
        col("sc2").cast("double") / col("n_days") - col("mu") * col("mu"),
        lit(0.0))))
    daily.join(broadcast(stats), Seq("user_id"))
      .withColumn("z", when(col("sd") > 0,
        (col("cnt") - col("mu")) / col("sd")).otherwise(lit(0.0)))
      .filter(abs(col("z")) >= 2.0)
      .select(col("user_id"), col("day").cast("timestamp").as("day"),
        col("cnt"), round(col("mu"), 6).as("mu"),
        round(col("z"), 6).as("z"))
      .orderBy(col("user_id"), col("day"))
  }

  val anomalyZscoreSql: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |stats AS (
      |  SELECT user_id, count(*) AS n_days, sum(cnt) AS sc,
      |         sum(cnt * cnt) AS sc2
      |  FROM daily GROUP BY 1),
      |st AS (
      |  SELECT user_id, CAST(sc AS DOUBLE) / n_days AS mu,
      |         sqrt(greatest(CAST(sc2 AS DOUBLE) / n_days -
      |           (CAST(sc AS DOUBLE) / n_days) *
      |           (CAST(sc AS DOUBLE) / n_days), 0)) AS sd
      |  FROM stats)
      |SELECT d.user_id, CAST(d.day AS TIMESTAMP) AS day,
      |       CAST(d.cnt AS BIGINT) AS cnt, round(st.mu, 6) AS mu,
      |       round(CASE WHEN st.sd > 0
      |         THEN (d.cnt - st.mu) / st.sd ELSE 0.0 END, 6) AS z
      |FROM daily d JOIN st ON d.user_id = st.user_id
      |WHERE abs(CASE WHEN st.sd > 0 THEN (d.cnt - st.mu) / st.sd
      |          ELSE 0.0 END) >= 2.0
      |ORDER BY d.user_id, day""".stripMargin

  /** Temporal (point-in-interval) join — THE consumption pattern of the
    * type-2 history [[scd2History]] builds: enrich each fact event with
    * the dimension version that was valid AT the event's instant
    * (user_id equality + `valid_from ≤ ts < valid_to`, open version =
    * null valid_to). Rolled up to (status-at-purchase-time, version)
    * cells so the output stays summary-grain.
    *
    * The equality key carries the join (shuffle/broadcast on user_id);
    * the interval predicate is a residual filter — never a cartesian.
    * Self-check built in: every fact matches EXACTLY one version (the
    * intervals partition each user's timeline by construction), asserted
    * by the spec via the conservation count. */
  def temporalJoin(s: SparkSession, dir: String): DataFrame = {
    val dim = scd2History(s, dir)
      .select(col("user_id"), col("version"), col("status"),
        col("valid_from"), col("valid_to"))
    val facts = Events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    facts.join(dim, facts("user_id") === dim("user_id") &&
        facts("ts") >= dim("valid_from") &&
        (dim("valid_to").isNull || facts("ts") < dim("valid_to")))
      .groupBy(col("status"), col("version"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(col("value")), 6).as("sum_value"))
      .orderBy(col("status"), col("version"))
  }

  val temporalJoinSql: String =
    """WITH ch AS (
      |  SELECT user_id, ts, event_id, event_type AS status,
      |         lag(event_type) OVER (PARTITION BY user_id
      |           ORDER BY ts, event_id) AS prev
      |  FROM events),
      |flt AS (SELECT * FROM ch WHERE prev IS NULL OR prev <> status),
      |dim AS (
      |  SELECT user_id,
      |         CAST(row_number() OVER w AS INT) AS version,
      |         status, ts AS valid_from, lead(ts) OVER w AS valid_to
      |  FROM flt
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT d.status, d.version,
      |       CAST(count(*) AS BIGINT) AS n_purchases,
      |       round(sum(f.value), 6) AS sum_value
      |FROM events f JOIN dim d
      |  ON f.user_id = d.user_id AND f.ts >= d.valid_from
      |  AND (d.valid_to IS NULL OR f.ts < d.valid_to)
      |WHERE f.event_type = 'purchase'
      |GROUP BY 1, 2 ORDER BY status, version""".stripMargin

  /** Rolling time-RANGE features — the feature-engineering primitive
    * behind every behavioral model: per event, the user's activity over
    * the trailing 24 hours (count and value sum over a RANGE frame, not
    * a ROWS frame — the window is temporal, so sparse and bursty users
    * get the same semantics). Ordered on exact microseconds both
    * engines; the frame is [ts − 24h, ts]. Output rolled up per user ×
    * event_type so the relation stays summary-grain (max/avg of the
    * per-event rolling counts). */
  def rollingFeatures(s: SparkSession, dir: String): DataFrame = {
    val dayUs = 24L * 3600L * 1000000L
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"))
      .rangeBetween(-dayUs, 0L)
    Events(s, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value"))
      .withColumn("roll_n", count(lit(1)).over(w))
      .withColumn("roll_v", sum(col("value")).over(w))
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        max(col("roll_n")).as("max_roll_n"),
        round(avg(col("roll_n")), 6).as("avg_roll_n"),
        round(max(col("roll_v")), 6).as("max_roll_v"))
      .orderBy(col("user_id"), col("event_type"))
  }

  val rollingFeaturesSql: String =
    """WITH r AS (
      |  SELECT user_id, event_type,
      |         count(*) OVER w AS roll_n,
      |         sum(value) OVER w AS roll_v
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |    RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW))
      |SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(max(roll_n) AS BIGINT) AS max_roll_n,
      |       round(avg(roll_n), 6) AS avg_roll_n,
      |       round(max(roll_v), 6) AS max_roll_v
      |FROM r GROUP BY 1, 2 ORDER BY user_id, event_type""".stripMargin

  /** Time-series calendar densification + LOCF imputation: per user,
    * materialize EVERY day of their active span (`sequence` + explode —
    * the generate_series idiom), left-join the daily aggregates,
    * zero-fill counts, and carry the last observed daily sum forward
    * across gap days (last-observation-carried-forward). The
    * forecasting/feature prerequisite: models read a dense regular grid,
    * event stores record a sparse one.
    *
    * Shape: daily rollup is one map-side-combined shuffle on
    * (user, day); the span relation is per-user min/max (same shuffle
    * grain); the grid explode is map-side from the tiny span relation;
    * the LOCF window sorts per user only. Grid size is
    * sum(user spans) — bounded by users × horizon, never events². */
  def timeseriesFill(s: SparkSession, dir: String): DataFrame = {
    val daily = Events(s, dir)
      .groupBy(col("user_id"),
        to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("raw_sum"))
    val grid = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"),
          expr("interval 1 day"))).as("day"))
    val locf = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      // DATE-typed outputs compare messily across engines (house rule:
      // cast to TIMESTAMP on both sides)
      .select(col("user_id"), col("day").cast("timestamp").as("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("n_events").isNull.as("is_gap"),
        round(col("raw_sum"), 6).as("day_sum"),
        round(last(col("raw_sum"), ignoreNulls = true).over(locf), 6)
          .as("locf_sum"))
      .orderBy(col("user_id"), col("day"))
  }

  val timeseriesFillSql: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |         count(*) AS n_events, sum(value) AS raw_sum
      |  FROM events GROUP BY 1, 2),
      |grid AS (
      |  SELECT user_id, CAST(unnest(generate_series(min(day), max(day),
      |           INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM daily GROUP BY user_id)
      |SELECT g.user_id, CAST(g.day AS TIMESTAMP) AS day,
      |       CAST(coalesce(d.n_events, 0) AS BIGINT) AS n_events,
      |       d.n_events IS NULL AS is_gap,
      |       round(d.raw_sum, 6) AS day_sum,
      |       round(last_value(d.raw_sum IGNORE NULLS) OVER (
      |         PARTITION BY g.user_id ORDER BY g.day
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
      |         AS locf_sum
      |FROM grid g LEFT JOIN daily d
      |  ON g.user_id = d.user_id AND g.day = d.day
      |ORDER BY g.user_id, g.day""".stripMargin

  /** Snapshot diff — the table-versioning primitive (what `DESCRIBE
    * HISTORY` + `table_changes` answer in Delta/Iceberg): given the base
    * `orders` snapshot and the next snapshot (the same deterministic CDC
    * feed as `etl_merge_upsert`: every 5th order repriced decimal-exact,
    * every 7th key inserted as a new negative key, plus every 11th key
    * DELETED), emit the row-level change relation — added / removed /
    * changed with both sides' values. One full outer join on the key;
    * unchanged rows never leave the join (filtered before the sort), so
    * output is proportional to the CHANGE volume, not the table.
    *
    * The reprice arithmetic is DECIMAL(18,2) end-to-end (the
    * merge_upsert precedent): rounding the DOUBLE product diverges
    * between engines at half-way points. */
  def snapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
    val base = o.select(col("o_orderkey").as("key"),
      col("o_orderpriority").as("priority"),
      col("o_totalprice").as("price"))
    val next = base.filter(col("key") % 11 =!= 0)
      .select(col("key"), col("priority"),
        when(col("key") % 5 === 0,
          round(col("price").cast("decimal(18,2)") *
            lit(new java.math.BigDecimal("1.1")), 2).cast("double"))
          .otherwise(col("price")).as("price"))
      .unionByName(base.filter(col("key") % 7 === 0)
        .select((-col("key") - 1L).as("key"), col("priority"),
          col("price")))
    base.select(col("key"), col("priority").as("old_priority"),
        col("price").as("old_price"))
      .join(next.select(col("key"), col("priority").as("new_priority"),
        col("price").as("new_price")), Seq("key"), "full_outer")
      .withColumn("change",
        when(col("old_price").isNull, "added")
          .when(col("new_price").isNull, "removed")
          .when(col("new_price") =!= col("old_price"), "changed"))
      .filter(col("change").isNotNull)
      .select(col("key"), col("change"),
        coalesce(col("old_priority"), col("new_priority")).as("priority"),
        col("old_price"), col("new_price"))
      .orderBy(col("change"), col("key"))
  }

  val snapshotDiffSql: String =
    """WITH base AS (
      |  SELECT o_orderkey AS key, o_orderpriority AS priority,
      |         o_totalprice AS price
      |  FROM orders),
      |next AS (
      |  SELECT key, priority,
      |         CASE WHEN key % 5 = 0
      |              THEN CAST(round(CAST(price AS DECIMAL(18,2)) * 1.1, 2)
      |                     AS DOUBLE)
      |              ELSE price END AS price
      |  FROM base WHERE key % 11 <> 0
      |  UNION ALL
      |  SELECT -key - 1, priority, price FROM base WHERE key % 7 = 0)
      |SELECT coalesce(b.key, n.key) AS key,
      |       CASE WHEN b.price IS NULL THEN 'added'
      |            WHEN n.price IS NULL THEN 'removed'
      |            WHEN n.price <> b.price THEN 'changed' END AS change,
      |       coalesce(b.priority, n.priority) AS priority,
      |       b.price AS old_price, n.price AS new_price
      |FROM base b FULL OUTER JOIN next n ON b.key = n.key
      |WHERE (CASE WHEN b.price IS NULL THEN 'added'
      |            WHEN n.price IS NULL THEN 'removed'
      |            WHEN n.price <> b.price THEN 'changed' END) IS NOT NULL
      |ORDER BY change, key""".stripMargin

  /** Right-to-be-forgotten cascade audit: a deterministic 5% of
    * customers request deletion (house 60-bit hash), and the referential
    * chain customer → orders → lineitem must follow. The relation
    * reports, per table, total rows, rows the cascade removes, and the
    * remainder — the compliance evidence a deletion job has to produce
    * BEFORE it mutates anything.
    *
    * Shape: the deletion key set is customer-grain (broadcastable); the
    * order-level key set comes from one semi join; lineitem counts from
    * a semi join against the order keys (shuffle on the join key at
    * scale — the natural key chain). Counts are conditional sums in
    * single aggregation passes; nothing is rewritten. */
  def cascadeDeleteAudit(s: SparkSession, dir: String): DataFrame = {
    val hash20 = (c: org.apache.spark.sql.Column) =>
      graft.functions.PortableHash.bucket(c, 20) === 0
    val cust = Tables(s, dir, "customer")
      .select(col("c_custkey"), hash20(col("c_custkey")).as("del"))
    val delKeys = cust.filter(col("del")).select(col("c_custkey"))
    val orders = Tables(s, dir, "orders")
      .join(broadcast(delKeys.withColumn("d", lit(1))
        .withColumnRenamed("c_custkey", "o_custkey")),
        Seq("o_custkey"), "left")
      .select(col("o_orderkey"), col("d").isNotNull.as("del"))
    val delOrders = orders.filter(col("del")).select(col("o_orderkey"))
    val li = Tables(s, dir, "lineitem")
      .join(delOrders.withColumn("d", lit(1))
        .withColumnRenamed("o_orderkey", "l_orderkey"),
        Seq("l_orderkey"), "left")
      .select(col("d").isNotNull.as("del"))
    def audit(df: DataFrame, table: String): DataFrame =
      df.agg(count(lit(1)).as("n_total"),
        sum(when(col("del"), 1L).otherwise(0L)).as("n_deleted"))
        .select(lit(table).as("table_name"), col("n_total"),
          col("n_deleted"),
          (col("n_total") - col("n_deleted")).as("n_after"))
    audit(cust, "customer")
      .unionByName(audit(orders, "orders"))
      .unionByName(audit(li, "lineitem"))
      .orderBy(col("table_name"))
  }

  val cascadeDeleteAuditSql: String =
    """WITH del AS (
      |  SELECT c_custkey FROM customer
      |  WHERE CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))
      |          AS BIGINT) % 20 = 0),
      |do_ AS (
      |  SELECT o_orderkey FROM orders
      |  WHERE o_custkey IN (SELECT c_custkey FROM del)),
      |c AS (
      |  SELECT 'customer' AS table_name, count(*) AS n_total,
      |         sum(CASE WHEN c_custkey IN (SELECT c_custkey FROM del)
      |             THEN 1 ELSE 0 END) AS n_deleted
      |  FROM customer),
      |o AS (
      |  SELECT 'orders', count(*),
      |         sum(CASE WHEN o_orderkey IN (SELECT o_orderkey FROM do_)
      |             THEN 1 ELSE 0 END)
      |  FROM orders),
      |l AS (
      |  SELECT 'lineitem', count(*),
      |         sum(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM do_)
      |             THEN 1 ELSE 0 END)
      |  FROM lineitem),
      |u AS (SELECT * FROM c UNION ALL SELECT * FROM o
      |      UNION ALL SELECT * FROM l)
      |SELECT table_name, CAST(n_total AS BIGINT) AS n_total,
      |       CAST(n_deleted AS BIGINT) AS n_deleted,
      |       CAST(n_total - n_deleted AS BIGINT) AS n_after
      |FROM u ORDER BY table_name""".stripMargin

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(
      ("scd2_history", scd2History _, Some(scd2HistorySql)),
      ("event_sessionize", eventSessionize _, Some(eventSessionizeSql)),
      ("anomaly_zscore", anomalyZscore _, Some(anomalyZscoreSql)),
      ("temporal_join", temporalJoin _, Some(temporalJoinSql)),
      ("rolling_features", rollingFeatures _, Some(rollingFeaturesSql)),
      ("timeseries_fill", timeseriesFill _, Some(timeseriesFillSql)),
      ("snapshot_diff", snapshotDiff _, Some(snapshotDiffSql)),
      ("cascade_delete_audit", cascadeDeleteAudit _,
        Some(cascadeDeleteAuditSql)))
}
