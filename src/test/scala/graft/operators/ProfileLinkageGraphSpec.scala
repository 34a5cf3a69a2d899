package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant gates for the round-11 continuation operators — each one
  * pins the property that IS the operator's reason to exist, against an
  * independent recomputation where one is cheap:
  *
  *   - triangle_count: total triangles from the degree-ordered oriented
  *     enumeration must equal a brute-force unordered triple join (the
  *     orientation is an optimization, never a semantics change), and
  *     every clustering coefficient must be a valid [0,1] ratio.
  *   - winsorize: the clip counts must actually be the ≤5% tails the
  *     rank arithmetic promises, and the winsorized mean must lie
  *     inside the clip bounds.
  *   - entity_match: the planted single-character deletion must be
  *     RECOVERED for every record (blocking never drops the true
  *     match — the design property of a corruption-robust blocking
  *     key), at edit distance exactly 1.
  *   - timeseries_fill: the grid is gap-free per user (span length
  *     equals row count — densification is the operator), gap days are
  *     zero-filled, and LOCF is non-null from the first observed day on
  *     (every user's first grid day is observed by construction).
  *   - snapshot_diff: change classes must reconcile exactly with the
  *     CDC rule that generated them (every 5th repriced, every 7th
  *     inserted, every 11th deleted).
  */
class ProfileLinkageGraphSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("profile-linkage-graph-spec")
    .getOrCreate()

  test("triangle_count matches a brute-force triple join") {
    val tc = GraphQueries.triangleCount(spark, dir).persist()
    val pairs = DedupQueries.jaccardPairs(spark, dir)
      .select(col("doc_a"), col("doc_b")).persist()
    try {
      // brute force: unordered triples (a < b < c) with all three edges
      val e = pairs
      val brute = e.as("ab")
        .join(e.as("bc"), col("ab.doc_b") === col("bc.doc_a"))
        .join(e.as("ac"), col("ab.doc_a") === col("ac.doc_a") &&
          col("bc.doc_b") === col("ac.doc_b"))
        .count()
      val total = tc.agg(sum(col("n_tri"))).head.getLong(0)
      assert(total === 3 * brute,
        s"per-node triangle total $total != 3 * $brute")
      val bad = tc.filter(col("clustering") < 0.0 ||
        col("clustering") > 1.0).count()
      assert(bad === 0)
      // a node's triangles cannot exceed its wedge count
      val over = tc.filter(col("n_tri") >
        col("deg") * (col("deg") - 1) / 2).count()
      assert(over === 0)
    } finally { tc.unpersist(); pairs.unpersist() }
  }

  test("winsorize clips the promised tails and bounds the mean") {
    val w = ProfileQueries.winsorize(spark, dir).collect()
    assert(w.length === 3)
    w.foreach { r =>
      val (n, p05, p95) = (r.getAs[Long]("n"), r.getAs[Double]("p05"),
        r.getAs[Double]("p95"))
      val (lo, hi) = (r.getAs[Long]("n_clip_lo"), r.getAs[Long]("n_clip_hi"))
      val mean = r.getAs[Double]("win_mean")
      assert(p05 < p95)
      // strictly-below-p05 rows are at most ceil(n/20) - 1
      assert(lo <= (n + 19) / 20 - 1 && lo >= n / 20 - 1)
      assert(hi <= n - (19 * n + 19) / 20 && hi >= n / 20 - 1)
      assert(mean > p05 && mean < p95)
    }
  }

  test("entity_match recovers every planted deletion at distance 1") {
    val m = LinkageQueries.entityMatch(spark, dir).persist()
    try {
      val parts = graft.core.Tables(spark, dir, "part").count()
      assert(m.count() === parts, "every record must find a match")
      assert(m.filter(!col("recovered") || col("dist") =!= 1)
        .count() === 0)
    } finally { m.unpersist() }
  }

  test("timeseries_fill densifies the calendar and carries LOCF") {
    val f = WarehouseQueries.timeseriesFill(spark, dir).persist()
    try {
      // per user: row count == span days, exactly one min day, no dup days
      val spans = f.groupBy(col("user_id"))
        .agg(count(lit(1)).as("rows"),
          count_distinct(col("day")).as("days"),
          datediff(max(col("day")), min(col("day"))).as("span"))
      assert(spans.filter(col("rows") =!= col("span") + 1 ||
        col("days") =!= col("rows")).count() === 0)
      // gap rows are zero-filled with null day_sum; observed rows aren't
      assert(f.filter(col("is_gap") &&
        (col("n_events") =!= 0 || col("day_sum").isNotNull)).count() === 0)
      assert(f.filter(!col("is_gap") && col("day_sum").isNull)
        .count() === 0)
      // first grid day per user is observed => locf never null
      assert(f.filter(col("locf_sum").isNull).count() === 0)
      // on observed days LOCF equals the day's own sum
      assert(f.filter(!col("is_gap") &&
        col("locf_sum") =!= col("day_sum")).count() === 0)
    } finally { f.unpersist() }
  }

  test("snapshot_diff reconciles with the CDC generation rule") {
    val d = WarehouseQueries.snapshotDiff(spark, dir).persist()
    val orders = graft.core.Tables(spark, dir, "orders")
      .select(col("o_orderkey").as("key")).persist()
    try {
      val added = orders.filter(col("key") % 7 === 0).count()
      val removed = orders.filter(col("key") % 11 === 0).count()
      val changed = orders.filter(col("key") % 5 === 0 &&
        col("key") % 11 =!= 0).count()
      val got = d.groupBy(col("change")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got("added") === added)
      assert(got("removed") === removed)
      assert(got("changed") === changed)
      // added rows carry no old side; removed rows no new side
      assert(d.filter(col("change") === "added" &&
        col("old_price").isNotNull).count() === 0)
      assert(d.filter(col("change") === "removed" &&
        col("new_price").isNotNull).count() === 0)
    } finally { d.unpersist(); orders.unpersist() }
  }

  test("schema_evolution reconciles vintages with the legacy default") {
    val e = FormatQueries.schemaEvolution(spark, dir).collect()
    val orders = graft.core.Tables(spark, dir, "orders")
    assert(e.map(_.getAs[Long]("n")).sum === orders.count())
    // the v=1 vintage surfaces ONLY the filled legacy default; v=2 never
    e.foreach { r =>
      if (r.getAs[Int]("v") == 1)
        assert(r.getAs[String]("priority") === "LEGACY")
      else assert(r.getAs[String]("priority") !== "LEGACY")
    }
    // vintage key parity: v=1 holds even keys, v=2 odd
    e.foreach { r =>
      val parity = if (r.getAs[Int]("v") == 1) 0L else 1L
      assert(r.getAs[Long]("min_key") % 2 === parity)
      assert(r.getAs[Long]("max_key") % 2 === parity)
    }
  }

  test("cascade_delete_audit is non-vacuous and self-consistent") {
    val a = WarehouseQueries.cascadeDeleteAudit(spark, dir).collect()
      .map(r => r.getAs[String]("table_name") -> r).toMap
    assert(a.keySet === Set("customer", "orders", "lineitem"))
    a.values.foreach { r =>
      assert(r.getAs[Long]("n_after") ===
        r.getAs[Long]("n_total") - r.getAs[Long]("n_deleted"))
      assert(r.getAs[Long]("n_deleted") > 0L, "vacuous cascade")
    }
    // nominal 5% hash selection; at the 150-customer fixture the
    // binomial spread is wide — bound loosely, non-vacuity is the gate
    val c = a("customer")
    val frac = c.getAs[Long]("n_deleted").toDouble / c.getAs[Long]("n_total")
    assert(frac > 0.0 && frac < 0.15, s"selection fraction $frac")
  }

  test("dq_rules: one scan, passing rules included, rates valid") {
    val r = ProfileQueries.dqRules(spark, dir).collect()
      .map(x => x.getAs[String]("rule") -> x).toMap
    assert(r.size === 5)
    val li = graft.core.Tables(spark, dir, "lineitem").count()
    r.values.foreach { x =>
      assert(x.getAs[Long]("n_checked") === li)
      val rate = x.getAs[Double]("violation_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
    // the enum constraint PASSES (zero violations, no sample key)...
    assert(r("flag_in_anr").getAs[Long]("n_violations") === 0L)
    assert(r("flag_in_anr").isNullAt(
      r("flag_in_anr").fieldIndex("first_bad_key")))
    // ...while the range constraints actually catch rows
    assert(r("quantity_le_45").getAs[Long]("n_violations") > 0L)
    assert(r("discount_le_008").getAs[Long]("n_violations") > 0L)
  }

  test("column_profile row/distinct invariants hold") {
    val p = ProfileQueries.columnProfile(spark, dir).collect()
    assert(p.length === 11)
    val nRows = p.head.getAs[Long]("n_rows")
    p.foreach { r =>
      assert(r.getAs[Long]("n_rows") === nRows)
      assert(r.getAs[Long]("n_distinct") <= nRows)
      assert(r.getAs[Long]("n_null") === 0L)
    }
    val flag = p.find(_.getAs[String]("col_name") == "l_returnflag").get
    assert(flag.getAs[Long]("n_distinct") === 3L)
    assert(flag.getAs[String]("min_repr") === "A")
    assert(flag.getAs[String]("max_repr") === "R")
  }
}
