// dev measurement tool, not part of the operator surface
package graft.operators.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.IvfQueries

/** Recall report for the PQ paths (informative, not a gate — both
  * queries are exactly hash-oracled, so CORRECTNESS is settled; this
  * reports the quality of the approximation on the adversarial
  * no-cluster fixture, in the same spirit as the round-6 AnnSweep
  * table).
  *
  * Ground truth is exact L2 top-10 (PQ's metric) per query vector by
  * brute force; recall@k = |approx top-k ∩ exact top-k| / k averaged
  * over the 5 query vectors.
  *
  * Usage: `runMain graft.operators.tools.PqRecall [sfDir]`
  */
object PqRecall {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dot = graft.functions.VectorOps.dot_product _

    val v = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nsq", dot(col("v"), col("v")))
    val q = v.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nsq").as("qsq"))
    val exact = broadcast(q).crossJoin(
        v.select(col("vec_id").as("neighbor_id"), col("v"), col("nsq")))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("l2",
        col("qsq") - lit(2.0) * dot(col("qv"), col("v")) + col("nsq"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("l2"), col("neighbor_id"))))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("neighbor_id"), col("rank"))

    def recall(approx: DataFrame, tag: String): Unit = {
      val a = approx.select(col("query_id"), col("neighbor_id"),
        col("rank").as("arank"))
      def at(k: Int): Double = {
        val hits = a.filter(col("arank") <= k)
          .join(exact.filter(col("rank") <= k),
            Seq("query_id", "neighbor_id"), "left_semi")
          .count()
        hits.toDouble / (5.0 * k)
      }
      println(f"[pq-recall] $tag%-12s recall@1=${at(1)}%.2f  recall@10=${at(10)}%.2f")
    }
    recall(IvfQueries.annPqAdc(spark, dir), "pq_adc")
    recall(IvfQueries.annIvfPq(spark, dir), "ivfpq")
    spark.stop()
  }
}
