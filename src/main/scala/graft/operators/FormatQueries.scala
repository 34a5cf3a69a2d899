package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Events, Tables}

/** Storage-format round-trips beyond parquet: the reference's data moves
  * through CSV and pickles only (SURVEY §2.2), but a Spark-native engine
  * inherits the built-in columnar/row formats for free and a user
  * switching over will reach for them — so their write→read→query paths
  * are exercised as first-class oracled queries. Each query writes a
  * testdata slice in the target format, reads it back, and aggregates;
  * the DuckDB oracle computes the same aggregate from the ORIGINAL
  * parquet, so a pass proves the round-trip was lossless, not merely
  * self-consistent.
  */
object FormatQueries {

  // unique scratch dirs keyed by (tag, data dir), reused across bench
  // reps, removed on JVM exit — see core.TempDirs for the race/leak
  // rationale. Keying by the data dir matters because these queries
  // return LAZY DataFrames over the scratch dir: a per-JVM singleton
  // would be overwritten by a second call at a different SF while the
  // first call's result is still being consumed (ADVICE r11).
  private val scratchDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def scratch(tag: String, dir: String): String =
    scratchDirs.computeIfAbsent(tag + "|" + dir,
      _ => graft.core.TempDirs.create(
        tag + "_" + graft.streaming.StreamingQueries.pathTag(dir)))
  private def orcDir(dir: String) = scratch("graft_orc_events", dir)
  private def jsonlDir(dir: String) = scratch("graft_jsonl_events", dir)

  /** ORC, written Hive-partitioned by event_type. The read-back filter is
    * on the PARTITION column, so the scan must prune directories — the
    * 100 TB posture for any low-cardinality routing key (the plan shows
    * the pruned partition filter, no row-level event_type predicate
    * left). */
  def orcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = orcDir(dir)
    // core.Events, not Tables: the raw scan needs the nanos-timestamp
    // legacy conf, and relying on an earlier query having set it would be
    // run-order-dependent
    Events(s, dir)
      .write.mode("overwrite").partitionBy("event_type").orc(out)
    s.read.orc(out)
      .filter(col("event_type").isin("click", "view"))
      .groupBy(col("event_type"))
      // value is 2-decimal: exact long-cents sum, order-independent
      // (r8 hazard sweep — the bucketed_join sf0.1 straddle class;
      // long-cents for the codegen fast path, see
      // RelationalExtraQueries.groupingSets)
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")).cast("double") /
          100.0).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"))
      .orderBy(col("event_type"))
  }

  val orcRoundtripSql: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
      |         / 100.0 AS sum_value,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |       min(event_id) AS min_id, max(event_id) AS max_id
      |FROM events WHERE event_type IN ('click', 'view')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** JSON-lines, read back with an EXPLICIT schema — never inference,
    * which at scale is a full extra pass over the data before the real
    * one (`spark.read.json` without a schema samples every file). The
    * nested `props` JSON string survives the write's escaping and is
    * parsed back out with get_json_object, covering the
    * string-inside-JSON round-trip the naive path corrupts. */
  def jsonlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = jsonlDir(dir)
    Events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("props"))
      .write.mode("overwrite").json(out)
    s.read
      .schema("event_id BIGINT, user_id BIGINT, event_type STRING, " +
        "value DOUBLE, props STRING")
      .json(out)
      .select(col("event_type"), col("value"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      // decimal sum as in orcRoundtrip. avg_k is safe as written: both
      // engines sum the BIGINT k exactly, so the division sees identical
      // operands and round(·,6) rounds the identical double (divergence
      // would need a shortest-repr half-way hit, measure ~1e-10 — unlike
      // the avg-of-drifting-double-sum class fixed in EtlQueries)
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")).cast("double") /
          100.0).as("sum_value"),
        round(avg(col("k")), 6).as("avg_k"))
      .orderBy(col("event_type"))
  }

  val jsonlRoundtripSql: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
      |         / 100.0 AS sum_value,
      |       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)),
      |         6) AS avg_k
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  private def evoDir(dir: String): String = scratch("graft_schema_evo", dir)

  /** Schema evolution — the append-only table whose schema GREW: v=1
    * files predate the `priority` column, v=2 files carry it. One read
    * with `mergeSchema` reconciles the partitions (old rows surface
    * NULL for the new column — exactly Parquet's evolution contract);
    * downstream fills the legacy default and aggregates across both
    * vintages. The everyday lakehouse situation every engine must
    * handle without a rewrite of history — at 100 TB "rewrite the old
    * files" is not an option, the READER carries the evolution.
    *
    * mergeSchema is the honest cost: schema reconciliation reads every
    * file's footer (a metadata pass, not a data pass). With a table
    * catalog the merged schema is known up front and the option is
    * unnecessary — documented here as the scale posture. */
  def schemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val ed = evoDir(dir)
    val o = Tables(s, dir, "orders")
    o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey").as("key"),
        col("o_totalprice").as("price"))
      .write.mode("overwrite").parquet(s"$ed/v=1")
    o.filter(col("o_orderkey") % 2 =!= 0)
      .select(col("o_orderkey").as("key"),
        col("o_totalprice").as("price"),
        col("o_orderpriority").as("priority"))
      .write.mode("overwrite").parquet(s"$ed/v=2")
    s.read.option("mergeSchema", "true").parquet(ed)
      .groupBy(col("v"),
        coalesce(col("priority"), lit("LEGACY")).as("priority"))
      .agg(count(lit(1)).as("n"),
        // 2-decimal quantities: exact long-cents sum, order-independent
        (sum(round(col("price") * 100).cast("long")).cast("double") /
          100.0).as("total"),
        min(col("key")).as("min_key"), max(col("key")).as("max_key"))
      .orderBy(col("v"), col("priority"))
  }

  /** The oracle replays the evolution logically: even keys are the
    * pre-migration vintage (v=1, LEGACY), odd keys the post-migration
    * one. */
  val schemaEvolutionSql: String =
    """WITH evo AS (
      |  SELECT 1 AS v, o_orderkey AS key, o_totalprice AS price,
      |         'LEGACY' AS priority
      |  FROM orders WHERE o_orderkey % 2 = 0
      |  UNION ALL
      |  SELECT 2, o_orderkey, o_totalprice, o_orderpriority
      |  FROM orders WHERE o_orderkey % 2 <> 0)
      |SELECT CAST(v AS INT) AS v, priority, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(round(price * 100) AS BIGINT)) AS DOUBLE)
      |         / 100.0 AS total,
      |       min(key) AS min_key, max(key) AS max_key
      |FROM evo GROUP BY 1, 2 ORDER BY v, priority""".stripMargin

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(
      ("orc_roundtrip", orcRoundtrip _, Some(orcRoundtripSql)),
      ("jsonl_roundtrip", jsonlRoundtrip _, Some(jsonlRoundtripSql)),
      ("schema_evolution", schemaEvolution _, Some(schemaEvolutionSql)))
}
