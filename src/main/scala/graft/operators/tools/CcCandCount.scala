package graft.operators.tools

import org.apache.spark.sql.functions._

import graft.operators.DedupQueries

/** One-off diagnostic: per-stripe banded candidate-pair counts for the
  * streaming CC probe — attributes the per-trigger growth (store scan
  * vs candidate volume) before picking the production lever. */
object CcCandCount {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1flat")
    val nStripes = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = DedupQueries.docs(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
    val sets = DedupQueries.wordHashSets(d).localCheckpoint(true)
    val bands = DedupQueries.bandRelation(
        sets.select(col("doc_id"), col("wh").as("sh")))
      .join(sets.select(col("doc_id"), col("source")), "doc_id")
      .localCheckpoint(true)
    val Array(idMin, idMax) = d.agg(min(col("doc_id")), max(col("doc_id")))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    val span = idMax - idMin + 1
    (0 until nStripes).foreach { k =>
      val lo = idMin + span * k / nStripes
      val hi = idMin + span * (k + 1) / nStripes
      val store = bands.filter(col("doc_id") < hi)
      val probe = bands.filter(col("doc_id") >= lo && col("doc_id") < hi)
      val nCand = store.as("x").join(
          probe.select(col("source"), col("band"), col("bh"),
            col("doc_id").as("probe_id")).as("y"),
          Seq("source", "band", "bh"))
        .filter(col("doc_id") =!= col("probe_id"))
        .select(least(col("doc_id"), col("probe_id")).as("da"),
          greatest(col("doc_id"), col("probe_id")).as("db"))
        .distinct().count()
      val rawCand = store.as("x").join(
          probe.select(col("source"), col("band"), col("bh"),
            col("doc_id").as("probe_id")).as("y"),
          Seq("source", "band", "bh"))
        .filter(col("doc_id") =!= col("probe_id")).count()
      println(s"[cand] t$k distinct=$nCand raw=$rawCand")
    }
    spark.stop()
  }
}
