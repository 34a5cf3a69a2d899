package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Second tier of relational function coverage: analytic-window extras,
  * string toolbox (incl. edit distance — fuzzy matching for the
  * training-data pipeline), and date/time arithmetic beyond Q17. All in
  * the dialect intersection with DuckDB so each is fully oracled.
  */
object RelationalExtraQueries {

  /** ntile / percent_rank / cume_dist / lead / first_value / nth_value +
    * a RANGE frame — the analytic functions Q12/Q13 don't touch. */
  def windowExtras(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val wRange = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"))
      .rangeBetween(-10000L, 0L)
    Tables(s, dir, "orders")
      .filter(col("o_custkey") < 40)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"),
        first(col("o_orderkey")).over(w).as("first_order"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_order"),
        count(lit(1)).over(wRange).as("n_within_10k"))
      .orderBy(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
  }

  val windowExtrasSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |  round(percent_rank() OVER w, 6) AS pr,
      |  round(cume_dist() OVER w, 6) AS cd,
      |  lead(o_orderkey, 1) OVER w AS next_order,
      |  first_value(o_orderkey) OVER w AS first_order,
      |  nth_value(o_orderkey, 2) OVER w AS second_order,
      |  CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
      |    RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS n_within_10k
      |FROM orders WHERE o_custkey < 40
      |WINDOW w AS (PARTITION BY o_custkey
      |             ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_custkey, o_totalprice, o_orderkey""".stripMargin

  /** lpad/rpad/trim family, reverse, repeat, levenshtein,
    * regexp_extract with a capture group, position. */
  def stringExtras(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "customer")
      .filter(col("c_custkey") <= 40)
      .select(
        col("c_custkey"),
        lpad(col("c_name"), 15, "*").as("lp"),
        rpad(col("c_mktsegment"), 12, ".").as("rp"),
        trim(lit("  pad  ")).as("tr"),
        reverse(col("c_mktsegment")).as("rev"),
        repeat(substring(col("c_name"), 1, 3), 2).as("rep"),
        levenshtein(col("c_mktsegment"), lit("BUILDING")).cast("long")
          .as("lev"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        instr(col("c_name"), "0").cast("long").as("pos0"))
      .orderBy(col("c_custkey"))

  val stringExtrasSql: String =
    """SELECT c_custkey,
      |  lpad(c_name, 15, '*') AS lp,
      |  rpad(c_mktsegment, 12, '.') AS rp,
      |  trim('  pad  ') AS tr,
      |  reverse(c_mktsegment) AS rev,
      |  repeat(substr(c_name, 1, 3), 2) AS rep,
      |  CAST(levenshtein(c_mktsegment, 'BUILDING') AS BIGINT) AS lev,
      |  coalesce(regexp_extract(c_name, '([0-9]+)', 1), '') AS digits,
      |  CAST(instr(c_name, '0') AS BIGINT) AS pos0
      |FROM customer WHERE c_custkey <= 40 ORDER BY c_custkey""".stripMargin

  /** date_trunc / last_day / add_months / quarter / dayofyear — beyond
    * Q17's year/month/datediff/date_add. Output as timestamps (DATE
    * round-trips messily across engines). */
  def dateExtras(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .filter(col("o_orderkey") <= 60)
      .select(
        col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        last_day(col("o_orderdate")).cast("timestamp").as("month_end"),
        add_months(col("o_orderdate"), 3).cast("timestamp").as("plus3m"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        dayofyear(col("o_orderdate")).cast("long").as("doy"))
      .orderBy(col("o_orderkey"))

  val dateExtrasSql: String =
    """SELECT o_orderkey,
      |  date_trunc('month', o_orderdate) AS month_start,
      |  CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
      |  CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus3m,
      |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
      |  CAST(dayofyear(o_orderdate) AS BIGINT) AS doy
      |FROM orders WHERE o_orderkey <= 60 ORDER BY o_orderkey""".stripMargin

  /** GROUPING SETS finer than A9's rollup/cube: two hand-picked sets plus
    * `grouping()` markers to disambiguate the null grain — via the SQL
    * form, which is the only public Spark surface for arbitrary sets.
    * `total` sums 2-decimal prices as LONG CENTS (r8 hazard sweep): the
    * grand-total grains sum the most rows, i.e. carry the largest
    * order-dependent float drift, so the double sum must go — but a
    * DECIMAL sum here cost ~1.8× (three grouping sets triple the
    * aggregation work and Spark's >18-digit decimal accumulation leaves
    * the long fast path). round(x*100) to INTEGER is cross-engine safe
    * (the true value is an integer ± ulps, never near k+0.5), the long
    * sum is exact and stays in codegen, and /100.0 of the same exact
    * integer is the identical double on both engines. */
  def groupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "orders").createOrReplaceTempView("orders_gs")
    // cents computed in a subquery BELOW the grouping: GROUPING SETS
    // expands every input row once per set (Expand, 3× here), so an
    // expression inside sum() would be re-evaluated per replica —
    // projected first, the Expand replicates a ready long instead
    s.sql("""
      SELECT o_orderpriority, o_orderstatus,
             CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
             CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS DOUBLE) / 100.0 AS total
      FROM (SELECT o_orderpriority, o_orderstatus,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders_gs)
      GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus),
                              (o_orderpriority, o_orderstatus))
      ORDER BY g_prio, g_status, o_orderpriority, o_orderstatus""")
  }

  val groupingSetsSql: String =
    """SELECT o_orderpriority, o_orderstatus,
      |       CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
      |       CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(cents) AS DOUBLE) / 100.0 AS total
      |FROM (SELECT o_orderpriority, o_orderstatus,
      |             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |      FROM orders)
      |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus),
      |                        (o_orderpriority, o_orderstatus))
      |ORDER BY g_prio, g_status, o_orderpriority, o_orderstatus""".stripMargin

  /** Correlated EXISTS + scalar subquery — Catalyst decorrelates both into
    * joins (the plan shows a semi join + an aggregate join, no per-row
    * subquery execution), which is exactly the 100 TB-safe shape. */
  def correlatedSubqueries(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "customer").createOrReplaceTempView("customer_cs")
    Tables(s, dir, "orders").createOrReplaceTempView("orders_cs")
    s.sql("""
      SELECT c.c_custkey, c.c_name,
             (SELECT CAST(count(*) AS BIGINT) FROM orders_cs o
              WHERE o.o_custkey = c.c_custkey) AS n_orders
      FROM customer_cs c
      WHERE EXISTS (SELECT 1 FROM orders_cs o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 300000)
        AND NOT EXISTS (SELECT 1 FROM orders_cs o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderstatus = 'F'
                          AND o.o_totalprice < 1000)
      ORDER BY c.c_custkey
      LIMIT 100""")
  }

  val correlatedSubqueriesSql: String =
    """SELECT c.c_custkey, c.c_name,
      |       (SELECT CAST(count(*) AS BIGINT) FROM orders o
      |        WHERE o.o_custkey = c.c_custkey) AS n_orders
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_totalprice > 300000)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderstatus = 'F'
      |                    AND o.o_totalprice < 1000)
      |ORDER BY c.c_custkey
      |LIMIT 100""".stripMargin

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(
      ("q_window_extras", windowExtras _, Some(windowExtrasSql)),
      ("q_string_extras", stringExtras _, Some(stringExtrasSql)),
      ("q_date_extras", dateExtras _, Some(dateExtrasSql)),
      ("q_grouping_sets", groupingSets _, Some(groupingSetsSql)),
      ("q_exists_correlated", correlatedSubqueries _,
        Some(correlatedSubqueriesSql)))
}
