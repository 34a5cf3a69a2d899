// dev measurement tool (graft.operators.tools to reach LayoutQueries'
// package-private z-code builder), not part of the operator surface
package graft.operators.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.LayoutQueries

/** Measures what `zorder_layout` only states: the scan-pruning effect of
  * the physical layout, in rows actually read off parquet.
  *
  * Writes the same lineitem projection three ways — natural order,
  * single-column range-sort by `pk`, and z-order (range-partition +
  * sort by the Morton code) — then runs the same point predicates on
  * each and reports `inputMetrics.recordsRead`. Spark prunes plain
  * parquet at ROW-GROUP granularity via pushed filters against
  * row-group min/max stats, so with one row group per file this is
  * file-skipping in effect:
  *
  *   - natural layout: every row group spans the full key range on both
  *     dimensions → no pruning, full-table read for any predicate;
  *   - pk-sorted: a `pk` predicate reads ~1/16 of the groups, an `sk`
  *     predicate reads everything — single-dimension clustering helps
  *     exactly one dimension;
  *   - z-order: BOTH predicates read a bounded fraction (~2^(-k/2) of
  *     the groups for 2 dimensions) — the multi-dimensional trade.
  *
  * At 100 TB "row group" becomes "file + row group" (any file-stat-
  * pruning table format extends the same min/max argument to file
  * level), and the measured ratios here are the fraction of the corpus
  * a point query must scan under each layout.
  *
  * Usage: `runMain graft.operators.tools.LayoutAb [sfDir] [files]`
  */
object LayoutAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nFiles = if (args.length > 1) args(1).toInt else 16
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val read = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            read.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
      })

    val base = java.nio.file.Files.createTempDirectory("layout_ab").toString
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"),
        col("l_partkey").cast("long").as("pk"),
        col("l_suppkey").cast("long").as("sk"))

    // pick real mid-range key values so every layout has matches
    val probe = li.agg(
      expr("percentile_approx(pk, 0.5)").cast("long"),
      expr("percentile_approx(sk, 0.5)").cast("long")).head
    val (pkVal, skVal) = (probe.getLong(0), probe.getLong(1))

    li.write.mode("overwrite").parquet(s"$base/natural")
    li.repartitionByRange(nFiles, col("pk")).sortWithinPartitions("pk")
      .write.mode("overwrite").parquet(s"$base/pksort")
    // z steers the physical layout only — it is dropped before the write
    LayoutQueries.withZ(li)
      .repartitionByRange(nFiles, col("z")).sortWithinPartitions("z")
      .select(col("l_orderkey"), col("l_extendedprice"), col("pk"),
        col("sk"))
      .write.mode("overwrite").parquet(s"$base/zorder")

    def measure(layout: String, pred: org.apache.spark.sql.Column)
        : (Long, Long) = {
      val df = spark.read.parquet(s"$base/$layout").filter(pred)
      Thread.sleep(300)
      read.set(0L)
      val matches = df.count()
      Thread.sleep(300)
      (read.get(), matches)
    }
    val total = spark.read.parquet(s"$base/natural").count()
    println(f"[layout-ab] total rows: $total, probes pk=$pkVal sk=$skVal, $nFiles files")
    Seq("natural", "pksort", "zorder").foreach { layout =>
      val (rPk, mPk) = measure(layout, col("pk") === pkVal)
      val (rSk, mSk) = measure(layout, col("sk") === skVal)
      println(f"[layout-ab] $layout%-8s pk-pred: read $rPk%8d (${100.0 * rPk / total}%5.1f%%) -> $mPk matches;  " +
        f"sk-pred: read $rSk%8d (${100.0 * rSk / total}%5.1f%%) -> $mSk matches")
    }
    spark.stop()
  }
}
