package graft.operators.tools

/** One-off: stage-level attribution for a registry query (wall ≥ 2 s
  * stages with task counts + max task) + the formatted plan head. */
object QuickProf {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val name = args(1)
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
          if (w >= 2.0) println(
            f"[qp] stage $id%4d wall $w%7.1f s tasks " +
              f"${e.stageInfo.numTasks}%5d maxTask " +
              f"${maxTask.getOrDefault(id, 0L) / 1000.0}%7.1f s  " +
              e.stageInfo.name.takeWhile(_ != '\n').take(90))
        }
      })
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[qp] total ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
