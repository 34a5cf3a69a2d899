package graft.core

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** The three `ts` encodings `Events.codec` must absorb (r9 regression:
  * the generator switched encodings mid-round and 11 queries died at
  * analysis). Legacy TIMESTAMP(NANOS) cannot be WRITTEN by Spark, but
  * under `nanosAsLong` it READS as LongType — identical to a plain
  * int64 `ts`, so the plain-long fixture exercises the exact branch the
  * legacy files take. The canonical contract: whatever the file stores,
  * the normalized `ts` is session-zone TimestampType with the same
  * instants.
  */
class EventsCodecSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("events-codec-spec")
    .getOrCreate()

  private val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"

  // 2021-03-04T05:06:07.123456Z as epoch micros
  private val micros = 1614834367123456L

  private def dirWith(write: String => Unit): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("events_codec_spec").toString
    TempDirs.cleanOnExit(java.nio.file.Paths.get(dir))
    write(s"$dir/events.parquet")
    dir
  }

  private def instants(dir: String): Seq[Long] =
    Events(spark, dir).select(unix_micros(col("ts")))
      .collect().map(_.getLong(0)).toSeq

  test("TimestampType (isAdjustedToUTC) passes through unchanged") {
    import spark.implicits._
    val dir = dirWith { path =>
      Seq(micros).toDF("us")
        .select(timestamp_micros(col("us")).as("ts"), lit(1L).as("event_id"))
        .write.parquet(path)
    }
    // the leak signature is the conf CHANGING across the probe — compare
    // to the pre-call value, not a literal (another suite in this JVM may
    // legitimately have taken the legacy path and left it "true")
    val before = spark.conf.get(NanosConf)
    val c = Events.codec(spark, dir)
    assert(c.schema("ts").dataType == TimestampType)
    assert(instants(dir) == Seq(micros))
    assert(spark.conf.get(NanosConf) == before,
      "probe must not leak nanosAsLong on the modern path")
  }

  test("TIMESTAMP_NTZ is normalized to the same UTC instant") {
    import spark.implicits._
    val dir = dirWith { path =>
      Seq(micros).toDF("us")
        .select(timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"),
          lit(1L).as("event_id"))
        .write.parquet(path)
    }
    val before = spark.conf.get(NanosConf)
    val c = Events.codec(spark, dir)
    assert(c.schema("ts").dataType == TimestampNTZType)
    val out = Events(spark, dir)
    assert(out.schema("ts").dataType == TimestampType)
    assert(instants(dir) == Seq(micros))
    assert(spark.conf.get(NanosConf) == before)
  }

  test("int64 ts (what legacy TIMESTAMP(NANOS) reads as) gets div-1000") {
    import spark.implicits._
    val dir = dirWith { path =>
      Seq((micros * 1000L, 1L)).toDF("ts", "event_id").write.parquet(path)
    }
    try {
      val c = Events.codec(spark, dir)
      assert(c.schema("ts").dataType == LongType)
      val out = Events(spark, dir)
      assert(out.schema("ts").dataType == TimestampType)
      assert(out.select(unix_micros(col("ts"))).head().getLong(0) == micros)
    } finally spark.conf.unset(NanosConf) // the legacy path leaves it set
  }

  test("pre-set nanosAsLong=false is restored, not clobbered") {
    import spark.implicits._
    val dir = dirWith { path =>
      Seq(micros).toDF("us")
        .select(timestamp_micros(col("us")).as("ts")).write.parquet(path)
    }
    spark.conf.set(NanosConf, "false")
    try {
      Events.codec(spark, dir)
      assert(spark.conf.get(NanosConf) == "false")
    } finally spark.conf.unset(NanosConf)
  }
}
