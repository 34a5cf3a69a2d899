package graft.operators.tools

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** One-off: run a registry query and print every physical node whose
  * codegen/op duration metric exceeds a threshold — node-grain hot-spot
  * attribution for estimate-cliff diagnosis (stage walls alone don't
  * say WHICH join the straggler task sits under). */
object NodeTimeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val name = args(1)
    val minMs = if (args.length > 2) args(2).toLong else 2000L
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.write.format("noop").mode("overwrite").save()

    def walk(p: SparkPlan, depth: Int): Unit = {
      val hot = p.metrics.toSeq.filter { case (k, m) =>
        (k.contains("time") || k.contains("duration") ||
          k.contains("Time")) && m.value >= minMs
      }
      if (hot.nonEmpty) {
        val rows = p.metrics.get("numOutputRows").map(_.value)
        println(f"${"  " * depth}${p.nodeName}%-40s " +
          hot.map { case (k, m) => s"$k=${m.value}ms" }.mkString(" ") +
          rows.map(r => s" rows=$r").getOrElse(""))
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case _ => p.children ++ p.subqueries
      }
      kids.foreach(walk(_, depth + 1))
    }
    walk(df.queryExecution.executedPlan, 0)
    spark.stop()
  }
}
