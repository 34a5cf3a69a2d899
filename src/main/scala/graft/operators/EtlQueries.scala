package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Events, Tables}
import graft.etl.MetadataCondenser
import graft.sources.CsvIo

/** ETL-surface queries: CSV source/sink round-trips (SURVEY §2.2 S1/S2/S7)
  * and the as-of join (§2.4 J9 — absent in the reference, exposed here).
  */
object EtlQueries {

  private def tmpDir(tag: String): String =
    graft.core.TempDirs.create(s"graft_$tag")

  /** The derived MWAS user input both CSV round-trips write and re-read. */
  private def userInputDf(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
    val qty = Tables(s, dir, "lineitem").groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("quantifier"))
    o.filter(col("o_orderkey") % 3 =!= 0)
      .join(qty, o("o_orderkey") === qty("l_orderkey"), "left_outer")
      .na.fill(Map("quantifier" -> 0.0))
      .select(
        concat(lit("R"), col("o_orderkey")).as("run"),
        col("o_orderpriority").as("group"),
        col("quantifier"))
  }

  /** S1+S7 round-trip: derive the MWAS user input from orders/lineitem,
    * write it through the CSV sink, re-read through the positional
    * schema-checked reader, aggregate. The oracle recomputes from the base
    * tables — so any drift in the CSV write→read path (quoting, dtype
    * parsing, header handling) breaks the hash match. */
  def csvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = tmpDir("csv_roundtrip")
    CsvIo.writeCsv(userInputDf(s, dir), path)
    CsvIo.readUserInput(s, path)
      .groupBy(col("group"))
      // round-half-way audit (r8): quantifier sums l_quantity, which is
      // integer-valued — the double sum is exact, round(·,4) is identity
      .agg(count(lit(1)).as("n"), round(sum(col("quantifier")), 4).as("total"))
      .orderBy(col("group"))
  }

  val csvRoundtripSql: String =
    """SELECT o_orderpriority AS "group", CAST(count(*) AS BIGINT) AS n,
      |       round(sum(coalesce(q.quantifier, 0)), 4) AS total
      |FROM orders o LEFT JOIN (
      |  SELECT l_orderkey, sum(l_quantity) AS quantifier
      |  FROM lineitem GROUP BY 1) q ON o.o_orderkey = q.l_orderkey
      |WHERE o_orderkey % 3 <> 0
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** S1+S7 through GZIP: production user CSVs arrive compressed. The
    * writer emits one .csv.gz per partition and the reader decompresses
    * by extension — both transparent in Spark. The at-scale caveat this
    * query exists to pin down: gzip is NOT SPLITTABLE, so each .gz file
    * is exactly one read task — parallelism is the FILE COUNT, which the
    * partitioned writer preserves (many modest files, never one giant
    * archive; the same reason the reference shards per bioproject file).
    * The aggregate adds min/max run so the string column must also
    * survive the compressed round-trip byte-for-byte. */
  def csvGzipRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = tmpDir("csv_gzip")
    userInputDf(s, dir).write.mode("overwrite")
      .option("header", "true").option("compression", "gzip").csv(path)
    CsvIo.readUserInput(s, path)
      .groupBy(col("group"))
      .agg(count(lit(1)).as("n"),
        // integer-valued sum — exact in double, round is identity
        round(sum(col("quantifier")), 4).as("total"),
        min(col("run")).as("first_run"),
        max(col("run")).as("last_run"))
      .orderBy(col("group"))
  }

  val csvGzipRoundtripSql: String =
    """SELECT o_orderpriority AS "group", CAST(count(*) AS BIGINT) AS n,
      |       round(sum(coalesce(q.quantifier, 0)), 4) AS total,
      |       min('R' || o_orderkey) AS first_run,
      |       max('R' || o_orderkey) AS last_run
      |FROM orders o LEFT JOIN (
      |  SELECT l_orderkey, sum(l_quantity) AS quantifier
      |  FROM lineitem GROUP BY 1) q ON o.o_orderkey = q.l_orderkey
      |WHERE o_orderkey % 3 <> 0
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** S2 + §2.8: wide metadata → CSV sink → schema-on-read → melt →
    * condenser. Same relation as `mwas_condense`, but arriving through the
    * dynamic-width CSV path the reference's converter_.py takes. */
  def csvCondense(s: SparkSession, dir: String): DataFrame = {
    val c = Tables(s, dir, "customer")
    val wide = c.select(
      concat(lit("BP"), col("c_custkey") % 20).as("bioproject"),
      concat(lit("BS"), col("c_custkey")).as("biosample_id"),
      col("c_mktsegment").as("mktsegment"),
      concat(lit("N"), col("c_nationkey") % 5).as("nation_bucket"))
    val path = tmpDir("csv_condense")
    CsvIo.writeCsv(wide, path)
    val back = CsvIo.readMetadataCsv(s, path)
    MetadataCondenser.condense(
        MetadataCondenser.melt(back, "bioproject", "biosample_id"))
      .select(col("bioproject"), col("attributes"), col("values"),
        // string, not ARRAY: the driver's pandas compare can't sort arrays
        array_join(col("members"), "; ").as("members"),
        col("n_stored").cast("long").as("n_stored"),
        col("include"), col("n_biosamples").cast("long").as("n_biosamples"))
      .orderBy(col("bioproject"), col("attributes"), col("values"))
  }

  /** J9 as-of join: for every click, the most recent error by the same
    * user at-or-before it. Spark has no ASOF JOIN operator; the idiomatic
    * equivalent is a union + `last(_, ignoreNulls)` over an unbounded
    * preceding window — one shuffle on user_id, no range explosion. The
    * oracle uses DuckDB's native ASOF LEFT JOIN, so the two formulations
    * check each other. */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Events(s, dir)
      .filter(col("event_type").isin("click", "error"))
      .select(col("event_id"), col("user_id"), col("ts"),
        (col("event_type") === "error").as("is_error"))
    // errors sort before clicks at equal ts so `ts >= error_ts` matches
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("is_error").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("last_error_ts",
        last(when(col("is_error"), col("ts")), ignoreNulls = true).over(w))
      .filter(!col("is_error"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("last_error_ts"),
        (unix_micros(col("ts")) - unix_micros(col("last_error_ts")))
          .as("gap_us"))
      .orderBy(col("event_id"))
  }

  val asofJoinSql: String =
    """SELECT c.event_id, c.user_id, c.ts::TIMESTAMP AS ts,
      |       e.ts::TIMESTAMP AS last_error_ts,
      |       epoch_us(c.ts::TIMESTAMP) - epoch_us(e.ts::TIMESTAMP) AS gap_us
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      |  ON c.user_id = e.user_id AND c.ts >= e.ts
      |ORDER BY c.event_id""".stripMargin

  /** S11/F12 JSON ingest: `events.props` is a JSON string column — parse
    * with from_json, aggregate on an extracted field, and emit a to_json
    * struct back out (the server's JSON→rows→JSON loop,
    * main/server.py:25-45). */
  def jsonIngest(s: SparkSession, dir: String): DataFrame =
    Events(s, dir)
      .withColumn("k",
        from_json(col("props"), lit("k INT")).getField("k"))
      .groupBy((col("k") % 10).cast("long").as("k_bucket"))
      // round(avg(value), 6) via the exact-integer-numerator recipe (see
      // hashSample): sum·10⁶ is an exact BIGINT through the long-cents
      // sum, so both engines divide the same integers and round at 0
      // decimals
      .agg(count(lit(1)).as("n"),
        (round((sum(round(col("value") * 100).cast("long")) * 10000)
          .cast("double") / count(lit(1))) / 1000000.0)
          .as("avg_value"))
      .withColumn("as_json",
        to_json(struct(col("k_bucket"), col("n"))))
      .orderBy(col("k_bucket"))

  val jsonIngestSql: String =
    """SELECT k_bucket, CAST(count(*) AS BIGINT) AS n,
      |       round(CAST(sum(CAST(round(value * 100) AS BIGINT))
      |           * 10000 AS DOUBLE) / count(*)) / 1000000.0
      |         AS avg_value,
      |       '{"k_bucket":' || k_bucket || ',"n":' || count(*) || '}'
      |         AS as_json
      |FROM (SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10
      |        AS k_bucket, value FROM events)
      |GROUP BY k_bucket ORDER BY k_bucket""".stripMargin

  /** W6 sampling, deterministic flavor: hash-mod sampling (md5 so both
    * engines draw the identical sample — Spark's rand(seed)/sample() draws
    * depend on partitioning, which no oracle can reproduce). Stratification
    * falls out of grouping the sample. */
  def hashSample(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .filter(substring(md5(col("o_orderkey").cast("string")), 1, 1)
        .isin("0", "1"))
      .groupBy(col("o_orderpriority"))
      // round(avg(price), 4), computed so the two engines CANNOT diverge
      // (plain round(avg,4) straddled a 1e-4 boundary at sf0.001 — the
      // engines' different summation orders produce different avg
      // doubles): the numerator sum·10⁴ is an exact BIGINT via the
      // long-cents sum (round(x*100) to integer is cross-engine safe —
      // the true value IS an integer ± ulps, never near k+0.5), the
      // single division of exact integers is correctly rounded hence
      // bit-identical, and the round is to ZERO decimals —
      // safe cross-engine because k+0.5 is exactly representable in
      // binary, unlike the k+5·10⁻ⁿ half-way points round(·,n≥1) trips on
      .agg(count(lit(1)).as("n"),
        (round((sum(round(col("o_totalprice") * 100).cast("long")) * 100)
          .cast("double") / count(lit(1))) / 10000.0)
          .as("avg_price"))
      .orderBy(col("o_orderpriority"))

  val hashSampleSql: String =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
      |       round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
      |           * 100 AS DOUBLE) / count(*)) / 10000.0
      |         AS avg_price
      |FROM orders
      |WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** W6 stratified sampling (the reference's size-bucket sampler,
    * main/bioproject_sampling.py:55-78): a different sampling rate per
    * stratum, deterministic via md5 buckets (the hash plays rand()'s role
    * so both engines — and any two cluster runs — draw the same rows).
    * Urgent orders kept at ~3/16, low-priority at ~8/16. */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val bucket = conv(substring(md5(col("o_orderkey").cast("string")), 1, 1),
      16, 10).cast("int")
    val rate = when(col("o_orderpriority") === "1-URGENT", 3)
      .when(col("o_orderpriority") === "5-LOW", 8)
      .otherwise(5)
    Tables(s, dir, "orders")
      .filter(bucket < rate)
      .groupBy(col("o_orderpriority"))
      // exact-integer-numerator avg as in hashSample above
      .agg(count(lit(1)).as("n_sampled"),
        (round((sum(round(col("o_totalprice") * 100).cast("long")) * 100)
          .cast("double") / count(lit(1))) / 10000.0)
          .as("avg_price"))
      .orderBy(col("o_orderpriority"))
  }

  val stratifiedSampleSql: String =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_sampled,
      |       round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
      |           * 100 AS DOUBLE) / count(*)) / 10000.0
      |         AS avg_price
      |FROM orders
      |WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1))::INT
      |      < CASE o_orderpriority WHEN '1-URGENT' THEN 3
      |                             WHEN '5-LOW' THEN 8 ELSE 5 END
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** One ANSI SQL text, executed VERBATIM by both engines: Spark runs it
    * through `spark.sql` over registered views, DuckDB runs it as the
    * oracle — proving the SQL entry point, not just the DataFrame API.
    * revenue sums a 2-decimal quantity as exact long cents (r8 hazard
    * sweep — see RelationalExtraQueries.groupingSets for why long-cents
    * beats a DECIMAL sum here): order-independent, so the identical SQL
    * text cannot diverge between the two engines' float-sum orders. */
  val sqlInterfaceSql: String =
    """SELECT n.n_name, o.o_orderpriority,
      |       CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
      |         AS DOUBLE) / 100.0 AS revenue
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE o.o_totalprice > 50000
      |GROUP BY n.n_name, o.o_orderpriority
      |ORDER BY n.n_name, o.o_orderpriority""".stripMargin

  def sqlInterface(s: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders", "nation").foreach { t =>
      Tables(s, dir, t).createOrReplaceTempView(t)
    }
    s.sql(sqlInterfaceSql)
  }

  /** S3 catalog-export path: write the catalog slice as parquet, read it
    * back through JdbcCatalog.fromParquet with a broadcast-semi-join run
    * filter (the offline stand-in for the JDBC IN-list pushdown), and
    * aggregate. */
  def catalogSemi(s: SparkSession, dir: String): DataFrame = {
    val cat = Tables(s, dir, "orders").select(
      concat(lit("R"), col("o_orderkey")).as("run"),
      concat(lit("BS"), col("o_custkey")).as("bio_sample"),
      concat(lit("BP"), col("o_custkey") % 20).as("bio_project"),
      col("o_totalprice").as("spots"))
    val path = tmpDir("catalog_export")
    cat.write.mode("overwrite").parquet(path)
    val runs = Tables(s, dir, "orders")
      .filter(col("o_orderkey") % 5 === 0)
      .select(concat(lit("R"), col("o_orderkey")).as("run"))
    graft.sources.JdbcCatalog.fromParquet(s, path, runs)
      .groupBy(col("bio_project"))
      // spots is 2-decimal: exact long-cents sum, order-independent
      // (r8 hazard sweep — the bucketed_join sf0.1 straddle class;
      // long-cents over a DECIMAL sum for the codegen fast path, see
      // RelationalExtraQueries.groupingSets)
      .agg(count(lit(1)).as("n_runs"),
        (sum(round(col("spots") * 100).cast("long")).cast("double") /
          100.0).as("total_spots"))
      .orderBy(col("bio_project"))
  }

  val catalogSemiSql: String =
    """SELECT 'BP' || (o_custkey % 20) AS bio_project,
      |       CAST(count(*) AS BIGINT) AS n_runs,
      |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
      |         AS DOUBLE) / 100.0 AS total_spots
      |FROM orders WHERE o_orderkey % 5 = 0
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** S12: the rejected-rows path end-to-end — a CSV where 1 in 7
    * quantifiers is non-numeric goes through the positional reader; the
    * rejects come back as a relation AND get sunk through the report
    * writer (the side-channel the reference prints to conversion_errors
    * .txt, main/converter_.py:73-112). The oracle recomputes the rejected
    * set from orders directly. */
  def rejectsReport(s: SparkSession, dir: String): DataFrame = {
    val input = Tables(s, dir, "orders").select(
      concat(lit("R"), col("o_orderkey")).as("run"),
      col("o_orderpriority").as("group"),
      when(col("o_orderkey") % 7 === 0, lit("not_a_number"))
        .otherwise(col("o_totalprice").cast("string")).as("quantifier"))
    val path = tmpDir("rejects_in")
    CsvIo.writeCsv(input, path)
    val routed = CsvIo.readUserInputRouted(s, path)
    CsvIo.writeRejectsReport(routed, tmpDir("rejects_report"))
    routed.filter(col("reject_reason").isNotNull)
      .select(col("run"), col("group"), col("quantifier_raw"),
        col("reject_reason"))
      .orderBy(col("run"))
  }

  val rejectsReportSql: String =
    """SELECT 'R' || o_orderkey AS run, o_orderpriority AS "group",
      |       'not_a_number' AS quantifier_raw,
      |       'non_numeric_quantifier' AS reject_reason
      |FROM orders WHERE o_orderkey % 7 = 0
      |ORDER BY run""".stripMargin

  /** Latest-wins merge (MERGE INTO / CDC upsert) — the corpus-refresh
    * shape every long-lived training dataset needs: a base snapshot plus
    * a change feed, merged so each key keeps its highest-version row.
    * Both relations derive deterministically from `orders` (the feed
    * re-prices every 5th order and adds NEW orders keyed past the base
    * range), so the oracle recomputes the merge from scratch.
    *
    * Shape: union → one shuffle on the merge key → per-key max-version
    * pick via row_number (WindowGroupLimit turns it into a streaming
    * top-1, no full sort of the group) → rollup. At scale this is the
    * standard pre-Delta/Iceberg merge: cost is one exchange of base+feed,
    * never a join of base against itself. */
  def mergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
    val base = o.select(col("o_orderkey").as("key"),
      col("o_orderpriority").as("priority"),
      col("o_totalprice").as("price"), lit(1L).as("version"))
    // the feed: re-price every 5th existing order, and append brand-new
    // keys beyond the base key range.
    // The reprice is decimal-exact by construction: prices are true
    // 2-decimal quantities, so cast DOUBLE→DECIMAL(18,2) recovers the
    // exact cents in both engines, DECIMAL(18,2) × DECIMAL(2,1) is exact,
    // and decimal round HALF_UP agrees between Spark and DuckDB. Rounding
    // the DOUBLE product instead provably diverges at half-way points
    // (Spark rounds the shortest decimal repr, DuckDB the binary value —
    // 6 rows differed by one cent at sf0.01).
    val repriced = o.filter(col("o_orderkey") % 5 === 0)
      .select(col("o_orderkey").as("key"), col("o_orderpriority")
        .as("priority"),
        round(col("o_totalprice").cast("decimal(18,2)") *
          lit(new java.math.BigDecimal("1.1")), 2)
          .cast("double").as("price"), lit(2L).as("version"))
    // new keys are NEGATIVE so they can never collide with a real
    // orderkey at ANY scale factor (a fixed positive offset would
    // collide once orderkeys grow past it, leaving two version-2 rows
    // whose row_number tie-break is nondeterministic)
    val inserts = o.filter(col("o_orderkey") % 7 === 0)
      .select((-col("o_orderkey") - 1L).as("key"),
        col("o_orderpriority").as("priority"),
        col("o_totalprice").as("price"), lit(2L).as("version"))
    val byKey = Window.partitionBy(col("key"))
      .orderBy(col("version").desc)
    base.unionByName(repriced).unionByName(inserts)
      .withColumn("rn", row_number().over(byKey))
      .filter(col("rn") === 1)
      .groupBy(col("priority"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("version") === 2, 1L).otherwise(0L)).as("n_changed"),
        // every price is a 2-decimal quantity (see repriced above), so
        // summing in DECIMAL is exact and order-independent — no
        // float-summation drift between Spark's partial aggs and DuckDB
        sum(col("price").cast("decimal(18,2)"))
          .cast("double").as("total_price"))
      .orderBy(col("priority"))
  }

  val mergeUpsertSql: String =
    """WITH merged AS (
      |  SELECT o_orderkey AS key, o_orderpriority AS priority,
      |         o_totalprice AS price, 1 AS version
      |  FROM orders
      |  UNION ALL
      |  SELECT o_orderkey, o_orderpriority,
      |         CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * 1.1, 2)
      |           AS DOUBLE), 2
      |  FROM orders WHERE o_orderkey % 5 = 0
      |  UNION ALL
      |  SELECT -o_orderkey - 1, o_orderpriority, o_totalprice, 2
      |  FROM orders WHERE o_orderkey % 7 = 0),
      |latest AS (
      |  SELECT * FROM (
      |    SELECT *, row_number() OVER (PARTITION BY key
      |      ORDER BY version DESC) AS rn
      |    FROM merged) WHERE rn = 1)
      |SELECT priority, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CASE WHEN version = 2 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_changed,
      |       CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE)
      |         AS total_price
      |FROM latest GROUP BY 1 ORDER BY 1""".stripMargin

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(
      ("etl_csv_roundtrip", csvRoundtrip _, Some(csvRoundtripSql)),
      ("etl_csv_gzip", csvGzipRoundtrip _, Some(csvGzipRoundtripSql)),
      ("etl_merge_upsert", mergeUpsert _, Some(mergeUpsertSql)),
      ("etl_rejects_report", rejectsReport _, Some(rejectsReportSql)),
      ("etl_csv_condense", csvCondense _,
        Some(MwasPipelineQueries.condenseSql)),
      ("asof_join", asofJoin _, Some(asofJoinSql)),
      ("json_ingest", jsonIngest _, Some(jsonIngestSql)),
      ("hash_sample", hashSample _, Some(hashSampleSql)),
      ("stratified_sample", stratifiedSample _, Some(stratifiedSampleSql)),
      ("sql_interface", sqlInterface _, Some(sqlInterfaceSql)),
      ("catalog_semi", catalogSemi _, Some(catalogSemiSql)))
}
