package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B of [[graft.plans.ExplodeCountRewrite]] ON REAL REGISTRY QUERIES
  * it fires on (FireCheck list: the gram-counting dedup/decontaminate
  * family). Arms share one fully-extended session type and differ only
  * in the rule's session kill-switch, order-balanced via [[AbHarness]].
  * Usage: sbt "runMain graft.tools.ExplodeRuleAb [dir] [names-csv] [reps]"
  */
object ExplodeRuleAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq).getOrElse(
      Seq("dedup_jaccard_pairs", "dedup_containment", "bloom_decontaminate"))
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    names.foreach { name =>
      def once(ruleOn: Boolean): Double = {
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
        val s = SparkSession.builder().master("local[32]")
          .config("spark.sql.shuffle.partitions", "32")
          .config("spark.ui.enabled", "false")
          .config(graft.plans.ExplodeCountRewrite.EnabledKey,
            ruleOn.toString)
          .withExtensions(new graft.extensions.GraftExtensions())
          .appName(s"explode-rule-ab-$name-$ruleOn")
          .getOrCreate()
        s.sparkContext.setLogLevel("ERROR")
        try {
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(name)(s, dir)
            .write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          println(f"[explode-rule-ab] $name rule=$ruleOn t=$dt%.2f s")
          dt
        } finally s.stop()
      }
      val (on, off) = AbHarness.interleaved(reps)(once)
      println(f"[explode-rule-ab] MEDIAN $name off=$off%.2f s on=$on%.2f s")
    }
  }
}
