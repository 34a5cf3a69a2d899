package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic contracts for the warehouse history/sequence operators (the
  * DuckDB oracle covers value agreement; these pin the invariants):
  *
  *   - `scd2_history`: versions chain — consecutive versions change
  *     value, each version's valid_to meets the next valid_from, and
  *     exactly one open (current) version exists per user.
  *   - `event_sessionize`: sessions tile the user's timeline — within a
  *     user they are ordered, disjoint, and separated by MORE than the
  *     30-minute gap (otherwise they would have merged).
  *   - `anomaly_zscore`: every flagged day's |z| clears the threshold
  *     and z's sign matches the deviation's.
  */
class WarehouseSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("warehouse-spec")
    .getOrCreate()

  test("scd2 versions chain with exactly one current row per user") {
    val rows = WarehouseQueries.scd2History(spark, dir)
      .select("user_id", "version", "status", "valid_from", "valid_to",
        "is_current").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (user, h) =>
      val sorted = h.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length),
        s"user $user versions not dense")
      assert(sorted.count(_.getBoolean(5)) == 1,
        s"user $user must have exactly one current version")
      assert(sorted.last.getBoolean(5), "the open version is the last")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getString(2) != b.getString(2),
            s"user $user consecutive versions with equal status")
          assert(a.getTimestamp(4) == b.getTimestamp(3),
            s"user $user validity intervals do not meet")
        case _ =>
      }
    }
  }

  test("sessions are ordered, disjoint, and split by real gaps") {
    val rows = WarehouseQueries.eventSessionize(spark, dir)
      .select("user_id", "session_seq", "session_start", "session_end",
        "n_events").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(!r.getTimestamp(3).before(r.getTimestamp(2))))
    rows.groupBy(_.getLong(0)).foreach { case (user, ss) =>
      val sorted = ss.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val gapUs = (b.getTimestamp(2).getTime -
            a.getTimestamp(3).getTime) * 1000L
          assert(gapUs > 1800L * 1000000L,
            s"user $user adjacent sessions closer than the gap")
        case _ =>
      }
    }
  }

  test("incremental scd2 reproduces the batch history bit-for-bit") {
    // the exactness claim of the streaming decomposition: closed ∪ open
    // across ts-ordered batches equals the one-shot lag-over-history
    val batch = WarehouseQueries.scd2History(spark, dir).collect()
    val streamed = graft.streaming.StreamingScd2.streamScd2(spark, dir)
      .collect()
    assert(batch.map(_.toSeq).toSeq == streamed.map(_.toSeq).toSeq)
  }

  test("temporal join matches every fact to exactly one version") {
    // the intervals partition each user's timeline, so the rollup must
    // conserve the fact count — any gap or overlap would break this
    val cells = WarehouseQueries.temporalJoin(spark, dir)
      .select("n_purchases").collect().map(_.getLong(0)).sum
    val facts = graft.core.Events(spark, dir)
      .filter(org.apache.spark.sql.functions.col("event_type") ===
        "purchase").count()
    assert(cells == facts, s"joined $cells of $facts purchase facts")
  }

  test("rolling range frames count at least the current row") {
    val rows = WarehouseQueries.rollingFeatures(spark, dir)
      .select("n_events", "max_roll_n", "avg_roll_n").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1 && r.getDouble(2) >= 1.0,
        "a RANGE frame always contains its own row")
      assert(r.getDouble(2) <= r.getLong(1).toDouble + 1e-9,
        "avg of the rolling counts cannot exceed their max")
    }
  }

  test("anomalies clear the threshold with sign-consistent z") {
    val rows = WarehouseQueries.anomalyZscore(spark, dir)
      .select("cnt", "mu", "z").collect()
    assert(rows.nonEmpty, "fixture produced no anomalies — vacuous")
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2)) >= 2.0 - 1e-6)
      assert((r.getLong(0) - r.getDouble(1)) * r.getDouble(2) > 0,
        "z sign must match the deviation")
    }
  }
}
