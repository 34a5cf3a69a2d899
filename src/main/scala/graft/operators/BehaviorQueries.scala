package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Events
import graft.functions.WelchTTest.welch_t

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
  def funnelConversion(s: SparkSession, dir: String): DataFrame =
    funnelFrom(Events(s, dir))

  /** The funnel's step types, in order — single-sourced so the
    * streaming state filter can never drift from the batch assembly. */
  private[operators] val funnelSteps: Seq[String] =
    Seq("view", "click", "purchase")

  /** Funnel assembly over an events-shaped relation — shared with the
    * streaming maintenance ([[StreamingFunnelQueries]]), whose state is
    * the funnel-type-filtered projection of the stream. */
  private[operators] def funnelFrom(evIn: DataFrame): DataFrame = {
    val ev = evIn.select(col("user_id"), col("event_type"), col("ts"))
    def step(prev: DataFrame, prevCol: String, typ: String,
        out: String): DataFrame =
      ev.filter(col("event_type") === typ)
        .join(prev, Seq("user_id"))
        .filter(col("ts") > col(prevCol) &&
          col("ts") <= col(prevCol) + expr("INTERVAL 7 DAYS"))
        .groupBy(col("user_id")).agg(min(col("ts")).as(out))
    val t1 = ev.filter(col("event_type") === funnelSteps(0))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val t2 = step(t1, "t1", funnelSteps(1), "t2")
    val t3 = step(t2.select("user_id", "t2"), "t2", funnelSteps(2), "t3")
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
  def retentionCohorts(s: SparkSession, dir: String): DataFrame =
    retentionFrom(Events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct())

  /** Cohort/retention assembly over a DISTINCT (user_id, day) activity
    * relation — shared verbatim by the batch query and the streaming
    * maintenance ([[StreamingRetentionQueries]]): the activity relation
    * is the mergeable state (distinct-of-union ≡ union-of-distincts),
    * so the stream hash-oracles against the literally-same SQL. */
  private[operators] def retentionFrom(act: DataFrame): DataFrame = {
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

  /** A/B experiment readout — the product-experimentation primitive:
    * users are deterministically hash-assigned to arms (the house 60-bit
    * md5 hash, so both engines derive the identical assignment), the
    * metric is aggregated to PER-USER means first (the
    * unit-of-randomization discipline — pooling raw events would let
    * heavy users dominate and correlate observations within a user),
    * and each event_type's arm contrast gets the Welch t / df / p-value
    * through the SAME native [[graft.functions.WelchTTest]] expression
    * the MWAS kernel uses. p hash-oracles through [[TCdfSql]]'s
    * continued-fraction incomplete beta, the q23_welch_full machinery.
    *
    * Shape: one shuffle to (user, event_type) grain, one to event_type
    * grain — both map-side combined; the t/p arithmetic is per-group
    * scalar work on a 5-row relation. */
  def experimentTtest(s: SparkSession, dir: String): DataFrame =
    experimentReadout(Events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(avg(col("value")).as("um")))

  /** Arm assignment + per-type Welch readout over a (user_id,
    * event_type, um) relation — shared verbatim by the batch query and
    * the streaming accumulation ([[StreamingExperimentQueries]]), which
    * is why the stream hash-oracles against the literally-same SQL. */
  private[operators] def experimentReadout(umRel: DataFrame): DataFrame = {
    val arm = graft.functions.PortableHash.bucket(col("user_id"), 2) === 0
    val um = umRel.withColumn("arm", arm)
    um.groupBy(col("event_type"))
      .agg(
        count(when(col("arm"), 1)).as("n_a"),
        count(when(!col("arm"), 1)).as("n_b"),
        avg(when(col("arm"), col("um"))).as("m_a"),
        avg(when(!col("arm"), col("um"))).as("m_b"),
        stddev_samp(when(col("arm"), col("um"))).as("s_a"),
        stddev_samp(when(!col("arm"), col("um"))).as("s_b"))
      .withColumn("w", welch_t(col("m_a"), col("s_a"),
        col("n_a").cast("double"),
        col("m_b"), col("s_b"), col("n_b").cast("double")))
      .select(col("event_type"), col("n_a"), col("n_b"),
        col("m_a"), col("m_b"),
        ((col("m_b") - col("m_a")) / col("m_a")).as("lift"),
        col("w.t").as("t"), col("w.df").as("df"), col("w.p").as("p"))
      .orderBy(col("event_type"))
  }

  val experimentTtestSql: String =
    s"""WITH RECURSIVE um AS (
       |  SELECT user_id, event_type, avg(value) AS um,
       |         (CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
       |            AS BIGINT) % 2) = 0 AS arm
       |  FROM events GROUP BY user_id, event_type),
       |s AS (
       |  SELECT event_type,
       |    count(*) FILTER (WHERE arm) AS n_a,
       |    count(*) FILTER (WHERE NOT arm) AS n_b,
       |    avg(um) FILTER (WHERE arm) AS m_a,
       |    avg(um) FILTER (WHERE NOT arm) AS m_b,
       |    stddev_samp(um) FILTER (WHERE arm) AS s_a,
       |    stddev_samp(um) FILTER (WHERE NOT arm) AS s_b
       |  FROM um GROUP BY 1),
       |s2 AS (
       |  -- WelchTTest.compute mirrored (zero-variance semantics incl.;
       |  -- the n<2 guard matches compute's None — a single-observation
       |  -- arm otherwise diverges: Spark stddev_samp is NaN where
       |  -- DuckDB's is NULL)
       |  SELECT event_type, n_a, n_b, m_a, m_b,
       |    CASE WHEN n_a < 2 OR n_b < 2 THEN NULL
       |         WHEN (s_a*s_a/n_a + s_b*s_b/n_b) > 0
       |         THEN (m_a - m_b) / sqrt(s_a*s_a/n_a + s_b*s_b/n_b)
       |         WHEN (s_a*s_a/n_a + s_b*s_b/n_b) = 0 AND m_a > m_b
       |         THEN CAST('infinity' AS DOUBLE)
       |         WHEN (s_a*s_a/n_a + s_b*s_b/n_b) = 0 AND m_a < m_b
       |         THEN CAST('-infinity' AS DOUBLE)
       |         WHEN (s_a*s_a/n_a + s_b*s_b/n_b) = 0
       |         THEN CAST('nan' AS DOUBLE) END AS t,
       |    CASE WHEN n_a < 2 OR n_b < 2 THEN NULL
       |         WHEN (s_a*s_a/n_a + s_b*s_b/n_b) > 0
       |         THEN pow(s_a*s_a/n_a + s_b*s_b/n_b, 2) /
       |              (pow(s_a*s_a/n_a, 2)/(n_a-1)
       |               + pow(s_b*s_b/n_b, 2)/(n_b-1))
       |         WHEN (s_a*s_a/n_a + s_b*s_b/n_b) = 0
       |         THEN CAST(1.0 AS DOUBLE) END AS df
       |  FROM s),
       |tdf_in AS (
       |  SELECT event_type, CASE WHEN isfinite(t) THEN t END AS t, df
       |  FROM s2),
       |${TCdfSql.fragment(Seq("event_type"))}
       |SELECT s2.event_type, s2.n_a, s2.n_b, s2.m_a, s2.m_b,
       |  (s2.m_b - s2.m_a) / s2.m_a AS lift, s2.t, s2.df,
       |  CASE WHEN s2.n_a < 2 OR s2.n_b < 2 THEN NULL
       |       WHEN isinf(s2.t) THEN CAST(0.0 AS DOUBLE)
       |       WHEN isnan(s2.t) THEN CAST('nan' AS DOUBLE)
       |       ELSE tp.p_cf END AS p
       |FROM s2 LEFT JOIN tcdf_p tp USING (event_type)
       |ORDER BY s2.event_type""".stripMargin

  /** First-order Markov transition matrix over each user's event
    * sequence — P(next event type | current), the sequence-model
    * baseline and the sanity check behind session-based features. One
    * per-user lead() window (shuffle on user_id, the store's natural
    * key), then a tiny (types × types) aggregation; probabilities are
    * per-row divisions of exact counts. */
  def markovTransitions(s: SparkSession, dir: String): DataFrame =
    markovFrom(Events(s, dir))

  /** Core over any events-shaped relation — property-tested on random
    * inputs against a plain-Scala reference in `BehaviorPropertySpec`. */
  private[operators] def markovFrom(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val wcur = Window.partitionBy(col("cur"))
    ev
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("cur"))
      .withColumn("next", lead(col("cur"), 1).over(w))
      .filter(col("next").isNotNull)
      .groupBy(col("cur"), col("next"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        round(col("n").cast("double") / sum(col("n")).over(wcur), 6))
      .orderBy(col("cur"), col("next"))
  }

  val markovTransitionsSql: String =
    """WITH seq AS (
      |  SELECT event_type AS cur,
      |         lead(event_type) OVER (PARTITION BY user_id
      |           ORDER BY ts, event_id) AS next
      |  FROM events),
      |cnt AS (
      |  SELECT cur, next, count(*) AS n FROM seq
      |  WHERE next IS NOT NULL GROUP BY 1, 2)
      |SELECT cur, next, CAST(n AS BIGINT) AS n,
      |       round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY cur), 6)
      |         AS p
      |FROM cnt ORDER BY cur, next""".stripMargin

  /** Interval union (coverage) per user: extend every event to a
    * 15-minute activity interval, merge overlaps (gaps-and-islands over
    * a running max of interval ends), and report interval count, total
    * covered time and the longest merged span — the "how much of the
    * day was this entity active" primitive (uptime/SLA math, ad
    * exposure, active-time billing). All arithmetic in integer
    * microseconds: bit-identical cross-engine, no float drift anywhere.
    * One window per user, one aggregation — shuffle on user_id only. */
  def intervalMerge(s: SparkSession, dir: String): DataFrame =
    intervalMergeFrom(Events(s, dir))

  /** Core over any events-shaped relation — property-tested on random
    * inputs against a plain-Scala merge in `BehaviorPropertySpec`. */
  private[operators] def intervalMergeFrom(ev: DataFrame): DataFrame = {
    val span = 900000000L // 15 min in micros
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("st"), col("en"))
    val prevMax = max(col("en"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    ev
      .select(col("user_id"), unix_micros(col("ts")).as("st"))
      .withColumn("en", col("st") + span)
      .withColumn("brk",
        when(prevMax.isNull || col("st") > prevMax, 1L).otherwise(0L))
      .withColumn("island", sum(col("brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("st")).as("ist"), max(col("en")).as("ien"),
        count(lit(1)).as("n_ev"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("ien") - col("ist")).as("covered_us"),
        max(col("ien") - col("ist")).as("max_span_us"),
        sum(col("n_ev")).as("n_events"))
      .orderBy(col("user_id"))
  }

  val intervalMergeSql: String =
    """WITH iv AS (
      |  SELECT user_id, epoch_us(ts) AS st, epoch_us(ts) + 900000000 AS en
      |  FROM events),
      |mk AS (
      |  SELECT user_id, st, en,
      |         max(en) OVER (PARTITION BY user_id ORDER BY st, en
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |           AS prev_max
      |  FROM iv),
      |isl AS (
      |  SELECT user_id, st, en,
      |         sum(CASE WHEN prev_max IS NULL OR st > prev_max
      |                  THEN 1 ELSE 0 END)
      |           OVER (PARTITION BY user_id ORDER BY st, en
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           AS island
      |  FROM mk),
      |m AS (
      |  SELECT user_id, island, min(st) AS ist, max(en) AS ien,
      |         count(*) AS n_ev
      |  FROM isl GROUP BY 1, 2)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
      |       CAST(sum(ien - ist) AS BIGINT) AS covered_us,
      |       CAST(max(ien - ist) AS BIGINT) AS max_span_us,
      |       CAST(sum(n_ev) AS BIGINT) AS n_events
      |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Session path mining — the top entry paths (first three event types
    * of each 30-minute session), the "how do users start" funnel
    * discovery primitive (what Amplitude calls Pathfinder). Sessions by
    * the same µs-exact gaps-and-islands rule as `event_sessionize`; the
    * path string is assembled IN-ROW from a sorted collect (sort_array
    * over (ts, event_id, type) structs — a deterministic total order, so
    * both engines concatenate the identical sequence).
    *
    * Shape: one window + one aggregation per user (session assembly),
    * then a tiny path-frequency aggregation; the collect is bounded by
    * session length, never the stream. */
  def topPaths(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val upTo = byUser.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val sess = Events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("brk",
        when(unix_micros(col("ts")) -
          lag(unix_micros(col("ts")), 1).over(byUser) > 1800000000L, 1L)
          .otherwise(lit(0L)))
      .withColumn("session_seq", sum(col("brk")).over(upTo))
    sess.groupBy(col("user_id"), col("session_seq"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"),
        col("event_type")))).as("evs"))
      .select(array_join(slice(expr("transform(evs, x -> x.event_type)"),
        1, 3), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(20)
  }

  val topPathsSql: String =
    """WITH g AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER
      |           (PARTITION BY user_id ORDER BY ts, event_id))
      |           > 1800000000 THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |se AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           AS session_seq
      |  FROM g),
      |paths AS (
      |  SELECT array_to_string(
      |           list_slice(list(event_type ORDER BY ts, event_id), 1, 3),
      |           '>') AS path
      |  FROM se GROUP BY user_id, session_seq)
      |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
      |FROM paths GROUP BY path
      |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin

  /** Item co-occurrence similarity — the collaborative-filtering
    * primitive ("users who touched i also touched j"): the item key is
    * parsed from the `props` JSON (F12), the user×item interaction
    * matrix is exact integer counts, and item–item cosine is computed
    * over the user dimension via the classic self-join on user. All
    * dot products and norms are exact integers; the only float is the
    * final `dot / sqrt(na*nb)`, written token-identically on both
    * engines.
    *
    * Scale shape: the self-join fans out per-user as (items/user)² —
    * bounded by capping per-user history (the standard production move;
    * here the natural bound is events/user), shuffled on user_id then
    * on the (i, j) pair grain, both map-side combined. The item-norm
    * relation is item-cardinality-sized and broadcasts. */
  def itemCooccurrence(s: SparkSession, dir: String): DataFrame = {
    val ui = Events(s, dir)
      .select(col("user_id"),
        from_json(col("props"), lit("k INT")).getField("k").as("item"))
      .groupBy(col("user_id"), col("item"))
      .agg(count(lit(1)).as("w"))
    val norms = ui.groupBy(col("item"))
      .agg(sum(col("w") * col("w")).as("nsq"))
    ui.as("a")
      .join(ui.as("b"), col("a.user_id") === col("b.user_id") &&
        col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
      .agg(sum(col("a.w") * col("b.w")).as("dot"),
        count(lit(1)).as("n_users"))
      .join(broadcast(norms.select(col("item").as("item_a"),
        col("nsq").as("na"))), "item_a")
      .join(broadcast(norms.select(col("item").as("item_b"),
        col("nsq").as("nb"))), "item_b")
      .select(col("item_a"), col("item_b"), col("n_users"), col("dot"),
        round(col("dot") / sqrt((col("na") * col("nb")).cast("double")),
          6).as("cosine"))
      .orderBy(col("cosine").desc, col("item_a"), col("item_b"))
      .limit(30)
  }

  val itemCooccurrenceSql: String =
    """WITH ui AS (
      |  SELECT user_id, CAST(json_extract(props, '$.k') AS INT) AS item,
      |         count(*) AS w
      |  FROM events GROUP BY 1, 2),
      |norms AS (SELECT item, sum(w * w) AS nsq FROM ui GROUP BY 1),
      |pairs AS (
      |  SELECT a.item AS item_a, b.item AS item_b,
      |         sum(a.w * b.w) AS dot, count(*) AS n_users
      |  FROM ui a JOIN ui b
      |    ON a.user_id = b.user_id AND a.item < b.item
      |  GROUP BY 1, 2)
      |SELECT item_a, item_b, CAST(n_users AS BIGINT) AS n_users,
      |       CAST(dot AS BIGINT) AS dot,
      |       round(CAST(dot AS BIGINT) / sqrt(CAST(na.nsq * nb.nsq
      |           AS DOUBLE)), 6) AS cosine
      |FROM pairs
      |JOIN norms na ON pairs.item_a = na.item
      |JOIN norms nb ON pairs.item_b = nb.item
      |ORDER BY cosine DESC, item_a, item_b LIMIT 30""".stripMargin

  /** Last-touch marketing attribution: every purchase is credited to
    * the user's most recent prior CLICK within a 7-day window, the
    * click's `props.k` acting as the campaign id; revenue rolls up per
    * campaign with an explicit unattributed bucket.
    *
    * Formulated WITHOUT a join: one per-user window carries the last
    * click's (ts, campaign) forward across the ordered event stream
    * (`last(ignoreNulls)` — the LOCF idiom), and each purchase row
    * reads the carried value map-side. On a user-bucketed event store
    * this is sort-only; the as-of JOIN formulation (`asof_join`) pays a
    * range join for the same answer — carrying state in a window is
    * the cheaper shape when both sides live in ONE ordered stream.
    * Revenue sums in exact long cents (2-decimal values). */
  def lastTouchAttribution(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ev = Events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"),
        from_json(col("props"), lit("k INT")).getField("k").as("k"))
      .withColumn("last_click", last(
        when(col("event_type") === "click",
          struct(col("ts").as("cts"), col("k").as("campaign"))),
        ignoreNulls = true).over(byUser))
    ev.filter(col("event_type") === "purchase")
      .withColumn("campaign",
        when(col("last_click").isNotNull &&
          unix_micros(col("ts")) -
            unix_micros(col("last_click.cts")) <= 604800000000L,
          col("last_click.campaign")))
      .groupBy(col("campaign"))
      .agg(count(lit(1)).as("n_purchases"),
        (sum(round(col("value") * 100).cast("long")).cast("double") /
          100.0).as("revenue"))
      .orderBy(col("campaign").asc_nulls_first)
  }

  val lastTouchAttributionSql: String =
    """WITH ev AS (
      |  SELECT user_id, ts, event_id, event_type, value,
      |         CAST(json_extract(props, '$.k') AS INT) AS k
      |  FROM events),
      |carried AS (
      |  SELECT *,
      |         last_value(CASE WHEN event_type = 'click'
      |             THEN struct_pack(cts := ts, campaign := k)
      |             END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           AS last_click
      |  FROM ev)
      |SELECT CASE WHEN last_click IS NOT NULL
      |            AND epoch_us(ts) - epoch_us((last_click).cts)
      |                <= 604800000000
      |            THEN (last_click).campaign END AS campaign,
      |       CAST(count(*) AS BIGINT) AS n_purchases,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
      |         / 100.0 AS revenue
      |FROM carried WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY campaign NULLS FIRST""".stripMargin


  /** Cohort lifetime-value curves — the revenue sibling of
    * [[retentionCohorts]]: per signup cohort (first active day),
    * cumulative purchase revenue per member by day offset. Revenue in
    * exact long cents; the cumulative window runs over the
    * (cohorts × offsets)-sized rollup, never the event stream; ltv is
    * one division of the exact cum-cents by the cohort size. */
  def cohortLtv(s: SparkSession, dir: String): DataFrame = {
    val ev = Events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        col("event_type"), col("value"))
    val cohort = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort"))
    val sizes = cohort.groupBy(col("cohort"))
      .agg(count(lit(1)).as("cohort_size"))
    val daily = ev.filter(col("event_type") === "purchase")
      .join(cohort, Seq("user_id"))
      .groupBy(col("cohort"),
        datediff(col("day"), col("cohort")).cast("long").as("day_offset"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
    val cum = Window.partitionBy(col("cohort")).orderBy(col("day_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("cum_cents", sum(col("cents")).over(cum))
      .join(broadcast(sizes), Seq("cohort"))
      .select(col("cohort").cast("timestamp").as("cohort"),
        col("day_offset"),
        (col("cum_cents").cast("double") / 100.0).as("cum_revenue"),
        col("cohort_size"),
        (col("cum_cents").cast("double") / 100.0 /
          col("cohort_size").cast("double")).as("ltv"))
      .orderBy(col("cohort"), col("day_offset"))
  }

  val cohortLtvSql: String =
    """WITH ev AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, event_type, value
      |  FROM events),
      |cohort AS (
      |  SELECT user_id, min(day) AS cohort FROM ev GROUP BY 1),
      |sizes AS (
      |  SELECT cohort, count(*) AS cohort_size FROM cohort GROUP BY 1),
      |daily AS (
      |  SELECT c.cohort,
      |         CAST(datediff('day', c.cohort, e.day) AS BIGINT)
      |           AS day_offset,
      |         sum(CAST(round(e.value * 100) AS BIGINT)) AS cents
      |  FROM ev e JOIN cohort c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase'
      |  GROUP BY 1, 2),
      |cum AS (
      |  SELECT cohort, day_offset,
      |         sum(cents) OVER (PARTITION BY cohort ORDER BY day_offset
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           AS cum_cents
      |  FROM daily)
      |SELECT CAST(c.cohort AS TIMESTAMP) AS cohort, c.day_offset,
      |       CAST(c.cum_cents AS DOUBLE) / 100.0 AS cum_revenue,
      |       CAST(s.cohort_size AS BIGINT) AS cohort_size,
      |       CAST(c.cum_cents AS DOUBLE) / 100.0 / s.cohort_size AS ltv
      |FROM cum c JOIN sizes s ON c.cohort = s.cohort
      |ORDER BY cohort, day_offset""".stripMargin
  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(
      ("funnel_conversion", funnelConversion _, Some(funnelConversionSql)),
      ("retention_cohorts", retentionCohorts _, Some(retentionCohortsSql)),
      ("experiment_ttest", experimentTtest _, Some(experimentTtestSql)),
      ("markov_transitions", markovTransitions _,
        Some(markovTransitionsSql)),
      ("interval_merge", intervalMerge _, Some(intervalMergeSql)),
      ("top_paths", topPaths _, Some(topPathsSql)),
      ("item_cooccurrence", itemCooccurrence _,
        Some(itemCooccurrenceSql)),
      ("last_touch_attribution", lastTouchAttribution _,
        Some(lastTouchAttributionSql)),
      ("cohort_ltv", cohortLtv _, Some(cohortLtvSql)))
}
