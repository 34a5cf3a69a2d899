package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-window A/B for the r8 DECIMAL-sum sites (VERDICT r8 item 3).
  *
  * q3_join_revenue / bucketed_join summed exact 1e-4-grid products
  * (2-dec × 2-dec) in DECIMAL through r8; the long-grid alternative
  * sums `cents × (100 − discount·100)` as BIGINT units of 1e-4 — the
  * SAME mathematical value (both exact). The r9 run of this probe
  * measured the decimal agg at 2.0× the long one (0.680 vs 0.338 s
  * isolated; 1.551 vs 1.163 s inside the full q3 join, NOTES_r9), so
  * both sites now ship long-grid and the decimal arm here preserves
  * the losing variant. This probe interleaves control / decimal / long
  * variants rep-by-rep so host-window drift hits all arms equally:
  * per-arm medians are comparable within one run even on a noisy host.
  *
  * Arms: `ctl` = q6_outer_join (untouched code, similar join+agg
  * weight); `q3dec`/`q3long` = the full q3 join with each sum;
  * `aggdec`/`agglong` = the bare groupBy-sum over lineitem (isolates
  * the aggregate cost from join noise).
  */
object DecimalAb {
  private def q3Dec(s: SparkSession, dir: String): DataFrame = {
    val tb = (ss: SparkSession, d: String, n: String) => graft.core.Tables(ss, d, n)
    val c = tb(s, dir, "customer")
    val o = tb(s, dir, "orders")
    val l = tb(s, dir, "lineitem")
    val n = tb(s, dir, "nation")
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1) - col("l_discount").cast("decimal(3,2)")))
        .cast("double").as("rev"))
      .orderBy(col("rev").desc, col("n_name"))
  }

  private def aggDec(s: SparkSession, dir: String): DataFrame =
    graft.core.Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1) - col("l_discount").cast("decimal(3,2)")))
        .cast("double").as("rev"))

  private def aggLong(s: SparkSession, dir: String): DataFrame =
    graft.core.Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg((sum(round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")))
        .cast("double") / 1e4).as("rev"))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(7)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val arms: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "ctl" -> graft.SparkEntry.queries("q6_outer_join"),
      "q3dec" -> (q3Dec _),
      "q3long" -> graft.SparkEntry.queries("q3_join_revenue"),
      "aggdec" -> (aggDec _),
      "agglong" -> (aggLong _))

    // equality check first: the long rewrite must be value-identical
    val lng = graft.SparkEntry.queries("q3_join_revenue")(spark, sfDir)
      .collect().toSeq
    val dec = q3Dec(spark, sfDir).collect().toSeq
    require(dec == lng, s"q3 long-grid != decimal:\n$dec\n$lng")
    println("[ab] q3 long-grid == decimal: OK")

    val times = collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to reps).foreach { _ =>
      arms.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        times(name) :+= (System.nanoTime() - t0) / 1e9
      }
    }
    def med(v: Vector[Double]): Double = {
      val s = v.sorted; s(s.size / 2)
    }
    val ctl = med(times("ctl"))
    arms.foreach { case (name, _) =>
      val m = med(times(name))
      println(f"[ab] $name%-8s median=$m%.3f s  vs-ctl=${m / ctl}%.2f  " +
        times(name).map(t => f"$t%.2f").mkString("[", " ", "]"))
    }
    spark.stop()
  }
}
