package graft.operators.tools

/** One-off: run a registry query and, for every stage with wall ≥
  * threshold, print its task count, max task, and the RDD SCOPES that
  * compose it (the WholeStageCodegen fragment ids / exchange nodes) —
  * the bridge from a straggler stage to the plan node it executes,
  * which node-metric walks can't see when the work hides inside a
  * persisted subtree's materialization. */
object StageScopeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val name = args(1)
    val minS = if (args.length > 2) args(2).toDouble else 2.0
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val maxTask = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageSubmitted(
            e: org.apache.spark.scheduler.SparkListenerStageSubmitted)
            : Unit = starts.put(e.stageInfo.stageId, System.nanoTime())
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          maxTask.merge(e.stageId, e.taskInfo.duration,
            (a, b) => math.max(a, b))
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val id = e.stageInfo.stageId
          val w = (System.nanoTime() -
            starts.getOrDefault(id, System.nanoTime())) / 1e9
          if (w >= minS) {
            val scopes = e.stageInfo.rddInfos
              .flatMap(_.scope).map(_.name).distinct.mkString(" | ")
            println(f"[ssp] stage $id%4d wall $w%6.1f s tasks " +
              f"${e.stageInfo.numTasks}%5d maxTask " +
              f"${maxTask.getOrDefault(id, 0L) / 1000.0}%6.1f s  $scopes")
          }
        }
      })
    graft.SparkEntry.queries(name)(spark, dir)
      .write.format("noop").mode("overwrite").save()
    spark.stop()
  }
}
