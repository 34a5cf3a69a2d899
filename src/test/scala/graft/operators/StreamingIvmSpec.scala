package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The retraction stream's contract, proven against an INDEPENDENT
  * plain-Scala replay of the CDC history (not the operator's own
  * DataFrames): fold the four batches' semantics over a collected base
  * snapshot and the maintained view must match exactly. A second gate
  * pins that retractions actually bind — the maintained view must
  * differ from what an append-only (insert-only) counter would have
  * produced, on both the migrated-group row and a deleted key's group —
  * otherwise an implementation that ignores before-images would pass
  * the first gate vacuously on a feed without updates. */
class StreamingIvmSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("streaming-ivm-spec")
    .getOrCreate()

  test("maintained view equals an independent replay; retractions bind") {
    // independent replay in plain Scala
    val base = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("o_orderkey", "o_orderpriority",
        "cast(round(o_totalprice * 100) as long) as cents")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val v1 = base.map { case (k, p, c) =>
      (k, p, if (k % 5 == 0) c + c / 10 else c) }
    val v2 = v1.map { case (k, p, c) =>
      (k, if (k % 3 == 0) "0-MOVED" else p, c) }
    val v3 = v2.filter(_._1 % 11 != 0) ++
      v2.filter(_._1 % 7 == 0).map { case (k, p, c) => (-k - 1, p, c) }
    val expect = v3.groupBy(_._2).map { case (p, rows) =>
      p -> (rows.size.toLong,
        math.rint(rows.map(_._3).sum.toDouble / 100.0 * 100) / 100)
    }

    val got = StreamingIvmQueries.streamIvmAgg(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

    assert(got.keySet == expect.keySet,
      s"groups differ: ${got.keySet} vs ${expect.keySet}")
    expect.foreach { case (p, (n, total)) =>
      assert(got(p)._1 == n, s"$p count: ${got(p)._1} != $n")
      assert(got(p)._2 == total, s"$p total: ${got(p)._2} != $total")
    }

    // retractions bind: the insert-only view of the same feed (all I
    // records, before-images ignored) must disagree with the maintained
    // view on EVERY group — deletes and migrations touched each one
    // (note '0-MOVED' is in both: keys ≡ 0 (mod 21) insert new rows
    // that already carry the migrated priority)
    val insertOnly = (base ++
      v2.filter(_._1 % 7 == 0).map { case (k, p, c) => (-k - 1, p, c) })
      .groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(got.contains("0-MOVED"), "migration group missing")
    got.keySet.foreach { p =>
      assert(insertOnly.get(p).exists(_ != got(p)._1),
        s"$p unchanged vs insert-only — retractions did not bind")
    }
  }
}
