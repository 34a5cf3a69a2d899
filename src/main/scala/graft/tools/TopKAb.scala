package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B: does the [[graft.plans.TopKPerGroup]] custom operator pay
  * against the stock `row_number() OVER (...) <= k` window spelling?
  *
  * Workload: top-5 events per user by value over the events fixture.
  * EXPECTED parity on the shuffle metric: Spark 4's WindowGroupLimit
  * rewrite bounds the window arm's exchange exactly like the
  * operator's partial stage does (the printed `shuffled=` counts come
  * out identical — that is the finding, not a bug). The remaining
  * difference is per-partition work: two full sorts (below and above
  * the exchange) vs bounded k-heaps. Same session, arms alternated
  * (AbHarness); row counts printed so a divergence is visible.
  * Usage: sbt "runMain graft.tools.TopKAb [dir] [reps]"
  */
object TopKAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val s = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      // AQE off so the shuffle metric is readable off the plan tree
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .appName("topk-ab")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val e = s.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_id"), col("value"))
      .localCheckpoint(true)

    def once(operator: Boolean): Double = {
      val df =
        if (operator)
          graft.plans.TopK.perGroup(e, Seq(col("user_id")),
            Seq(col("value").desc, col("event_id")), 5)
        else
          e.withColumn("rn", row_number().over(
              org.apache.spark.sql.expressions.Window
                .partitionBy(col("user_id"))
                .orderBy(col("value").desc, col("event_id"))))
            .filter(col("rn") <= 5).drop("rn")
      // execute THIS plan tree (df.count() would build and execute a
      // sibling plan, leaving these metrics untouched)
      val qe = df.queryExecution
      val t0 = System.nanoTime()
      val n = qe.executedPlan.execute().count()
      val dt = (System.nanoTime() - t0) / 1e9
      // the cluster-relevant number: what crossed the exchange (local
      // wall-clock barely notices a RAM-resident sort; a network
      // shuffle does)
      val shuffled = qe.executedPlan.collect {
        case ex: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          ex.metrics("shuffleRecordsWritten").value
      }.sum
      println(f"[topk-ab] operator=$operator rows=$n " +
        f"shuffled=$shuffled t=$dt%.2f s")
      dt
    }
    val (on, off) = AbHarness.interleaved(reps)(once)
    println(f"[topk-ab] MEDIAN window=$off%.2f s operator=$on%.2f s")
    s.stop()
  }
}
