package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Bucketing: pre-shuffled, co-located storage so repeated joins on the
  * bucket key run with NO exchange on either side (SURVEY O3/O6 scale
  * notes; the 100 TB answer to "this join runs every day"). Both fact
  * tables are written bucketed by order key into the session catalog;
  * the join then reads bucket-aligned splits. `BucketSpec`'s plan
  * assertion pins the absence of a shuffle before the join.
  */
object BucketQueries {

  /** Write orders+lineitem bucketed by order key (8 buckets), join on the
    * bucket key, aggregate revenue by priority. Result is
    * storage-layout-independent, so the plain-join oracle must match. */
  def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    // the in-memory catalog forgets managed tables across sessions but
    // their warehouse directories survive, and saveAsTable then fails with
    // LOCATION_ALREADY_EXISTS even in overwrite mode — drop both
    Seq("b_orders", "b_lineitem").foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir") + s"/$t")
      loc.getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(loc, true)
    }
    Tables(s, dir, "orders")
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    Tables(s, dir, "lineitem")
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")
    joinPlan(s)
  }

  /** The join over the bucketed tables (factored out so the spec can
    * inspect its physical plan).
    *
    * Revenue sums products of two 2-decimal quantities — every addend is
    * exactly on the 1e-4 grid, so the BIGINT grid-units sum
    * (`cents × (100 − discount·100)`, the long-cents class; switched
    * from DECIMAL after the r9 A/B measured decimal at 2.0× — see
    * RelationalQueries.q3 for the value-identity argument and the
    * per-group 9.2e14-currency-unit overflow bound) is exact and
    * order-independent. Summing in DOUBLE and rounding to 4 is NOT: at
    * sf0.1 the ~6e9 sum carries ulp-level (≈2e-6) order-dependent error,
    * and Spark's and DuckDB's sums landed on adjacent 1e-4 grid points
    * (…8477 vs …8476) — caught by the tightened selfcheck in r8. */
  def joinPlan(s: SparkSession): DataFrame =
    s.table("b_orders")
      .join(s.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .cast("double") / 1e4).as("revenue"))
      .orderBy(col("o_orderpriority"))

  val bucketedJoinSql: String =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |         * (100 - CAST(round(l_discount * 100) AS BIGINT)))
      |         AS DOUBLE) / 1e4 AS revenue
      |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(("bucketed_join", bucketedJoin _, Some(bucketedJoinSql)))
}
