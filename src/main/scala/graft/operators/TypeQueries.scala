package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Type-system depth: pivot, MapType functions, and DecimalType
  * arithmetic (SURVEY §1.2 — absent in the reference, native here).
  */
object TypeQueries {

  private val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
    "4-NOT SPECIFIED", "5-LOW")

  /** groupBy().pivot() with an explicit value list (explicit so the plan
    * needs no extra distinct-values job and the output schema is stable).
    * Cell sums are exact long cents (r8 hazard sweep): order-independent,
    * so a pivot cell can never straddle a round grid between the engines'
    * different summation orders — and the long sum stays in codegen
    * (see RelationalExtraQueries.groupingSets for the decimal-vs-cents
    * trade). */
  def pivotQuery(s: SparkSession, dir: String): DataFrame = {
    val p = Tables(s, dir, "orders")
      .groupBy((col("o_custkey") % 10).cast("long").as("bucket"))
      .pivot("o_orderpriority", priorities)
      .agg(sum(round(col("o_totalprice") * 100).cast("long"))
        .cast("double") / 100.0)
    priorities.zipWithIndex.foldLeft(p) { case (df, (v, i)) =>
      df.withColumnRenamed(v, s"p${i + 1}")
    }.orderBy(col("bucket"))
  }

  val pivotSql: String =
    """SELECT o_custkey % 10 AS bucket,
      |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS DOUBLE) / 100.0 AS p1,
      |  CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS DOUBLE) / 100.0 AS p2,
      |  CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS DOUBLE) / 100.0 AS p3,
      |  CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS DOUBLE) / 100.0 AS p4,
      |  CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS DOUBLE) / 100.0 AS p5
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** MapType: build a priority→count map per bucket with
    * map_from_entries, then read it back with element_at / map_keys /
    * cardinality. The map stays internal — outputs are scalars so the
    * oracle compares cleanly. */
  def mapFnsQuery(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .groupBy((col("o_custkey") % 10).cast("long").as("bucket"),
        col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("bucket"))
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("o_orderpriority"), col("cnt"))))).as("m"))
      .select(
        col("bucket"),
        element_at(col("m"), "1-URGENT").as("n_urgent"),
        element_at(col("m"), "5-LOW").as("n_low"),
        size(col("m")).cast("long").as("n_keys"),
        array_join(map_keys(col("m")), ",").as("keys"))
      .orderBy(col("bucket"))

  val mapFnsSql: String =
    """WITH c AS (
      |  SELECT o_custkey % 10 AS bucket, o_orderpriority, count(*) AS cnt
      |  FROM orders GROUP BY 1, 2)
      |SELECT bucket,
      |  max(CASE WHEN o_orderpriority = '1-URGENT' THEN cnt END) AS n_urgent,
      |  max(CASE WHEN o_orderpriority = '5-LOW' THEN cnt END) AS n_low,
      |  CAST(count(*) AS BIGINT) AS n_keys,
      |  string_agg(o_orderpriority, ',' ORDER BY o_orderpriority) AS keys
      |FROM c GROUP BY bucket ORDER BY bucket""".stripMargin

  /** DecimalType: exact fixed-point accumulation (no float drift), cast
    * to double only at the output edge. */
  def decimalQuery(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .select(col("l_returnflag"),
        col("l_extendedprice").cast("decimal(18,2)").as("p"),
        col("l_discount").cast("decimal(18,4)").as("d"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("p")).cast("double").as("sum_price"),
        sum(col("p") * (lit(java.math.BigDecimal.ONE).cast("decimal(18,4)")
          - col("d"))).cast("double").as("sum_discounted"),
        avg(col("d")).cast("double").as("avg_disc"))
      .orderBy(col("l_returnflag"))

  val decimalSql: String =
    """SELECT l_returnflag,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS sum_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |           * (CAST(1 AS DECIMAL(18,4))
      |              - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
      |    AS sum_discounted,
      |  CAST(avg(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS avg_disc
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(
      ("q_pivot", pivotQuery _, Some(pivotSql)),
      ("q_map_fns", mapFnsQuery _, Some(mapFnsSql)),
      ("q_decimal", decimalQuery _, Some(decimalSql)))
}
