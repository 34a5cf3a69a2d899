package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch reader for the `events` table.
  *
  * The testdata stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
  * parquet reader rejects ([PARQUET_TYPE_ILLEGAL]). Reading with the
  * `nanosAsLong` legacy conf yields raw nanos; integer division converts
  * losslessly to microseconds (double division would corrupt — 1.7e18 ns
  * exceeds the 2^53 exact-double range).
  */
object Events {
  def apply(s: SparkSession, sfDir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
}
