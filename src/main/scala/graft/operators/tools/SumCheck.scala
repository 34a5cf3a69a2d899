package graft.operators.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Attribution probe for the range-join decade table: the TRUE
  * qualifying-pair volume (sum of n_active) per fixture, so the wall
  * slope can be charged to the answer's own size rather than guessed.
  * Usage: sbt "runMain graft.operators.tools.SumCheck <dir>..." */
object SumCheck {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    args.foreach { dir =>
      val r = graft.operators.RangeJoinQueries.rangeJoinBinned(s, dir)
        .agg(sum(col("n_active")), count(lit(1))).head()
      println(s"[sumcheck] $dir true_pairs=${r.getLong(0)} points=${r.getLong(1)}")
    }
    s.stop()
  }
}
