package graft.operators.tools

/** One-off: run a registry query and print the AQE-FINAL physical plan
  * (join strategies actually executed, not the static guess) plus the
  * join-node lines — the instrument for estimate-cliff diagnosis: run
  * at two fixture scales and diff the join lines. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val name = args(1)
    val full = args.length > 2 && args(2) == "full"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    if (full) println(plan)
    else plan.linesIterator.zipWithIndex.foreach { case (l, i) =>
      if (l.contains("Join") || l.contains("Exchange") ||
        l.contains("Window") || l.contains("Sort ") ||
        l.contains("Aggregate"))
        println(f"$i%4d $l")
    }
    spark.stop()
  }
}
