package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType, TimestampType}

/** Schema-adaptive reader for the `events` table.
  *
  * The testdata's `ts` encoding has changed once already (round 9: the
  * generator moved from parquet TIMESTAMP(NANOS) to TIMESTAMP(MICROS)
  * mid-round, breaking every events consumer that hard-coded the nanos
  * path). This reader probes the file's actual schema and adapts:
  *
  *   - `LongType` (TIMESTAMP(NANOS) read under the `nanosAsLong` legacy
  *     conf, which is the only way Spark reads nanos at all): raw nanos →
  *     `timestamp_micros(ts div 1000)`. Integer division is lossless for
  *     µs-precision values; double division would corrupt (1.7e18 ns
  *     exceeds the 2^53 exact-double range).
  *   - `TimestampType`: already canonical — pass through.
  *   - `TimestampNTZType` (parquet isAdjustedToUTC=false under Spark's
  *     default NTZ inference): cast to session-zone `TimestampType`. All
  *     graft sessions pin `spark.sql.session.timeZone=UTC`, so the naive
  *     micros value maps to the identical instant the DuckDB oracle sees
  *     when it reads the same file as a naive TIMESTAMP.
  *
  * Canonical output: `ts` is always `TimestampType` — the shape every
  * downstream query (windows, watermarks, `unix_micros`) was verified
  * against.
  *
  * Conf scoping: the probe sets `nanosAsLong` only while reading the
  * footer and restores it immediately on the modern paths. On the legacy
  * path it MUST stay set — the conf is consulted at scan execution time,
  * not plan time — which is documented here as the one deliberate
  * session-conf side effect (it is a no-op for non-nanos files).
  */
object Events {
  /** Raw scan schema (for `readStream.schema(...)`) plus the transform
    * that normalizes `ts` to `TimestampType`. */
  final case class Codec(schema: StructType, normalize: DataFrame => DataFrame)

  private val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"

  /** Serializes the probe's set/restore of the session-global nanos conf
    * (ADVICE r10): without it, a concurrent codec() on a modern-path file
    * could restore/unset the conf in the window between a legacy-path
    * plan build and its execution. The lock covers only the probe; on the
    * legacy path the conf intentionally remains set after release, and a
    * later modern-path probe under the lock snapshots prev="true" and
    * restores it unchanged, so interleavings after codec() returns are
    * benign. */
  private val probeLock = new Object

  def codec(s: SparkSession, sfDir: String): Codec = probeLock.synchronized {
    val path = s"$sfDir/events.parquet"
    val prev = s.conf.getOption(NanosConf)
    def restore(): Unit = prev match {
      case Some(v) => s.conf.set(NanosConf, v)
      case None    => s.conf.unset(NanosConf)
    }
    s.conf.set(NanosConf, "true")
    val schema =
      try s.read.parquet(path).schema
      catch { case e: Throwable => restore(); throw e }
    val tsType =
      try schema("ts").dataType
      catch { case e: Throwable =>
        restore()
        throw new IllegalStateException(
          s"events table at $path has no ts column (schema: " +
            s"${schema.fieldNames.mkString(", ")})", e)
      }
    tsType match {
      case LongType => // legacy nanos: conf stays set for the scan itself
        Codec(schema, _.withColumn("ts", expr("timestamp_micros(ts div 1000)")))
      case TimestampType =>
        restore()
        Codec(schema, identity)
      case TimestampNTZType =>
        restore()
        Codec(schema, _.withColumn("ts", col("ts").cast(TimestampType)))
      case other =>
        restore()
        throw new IllegalStateException(
          s"events.ts has unsupported type $other in $path — " +
            "expected int64-nanos (legacy), TIMESTAMP, or TIMESTAMP_NTZ")
    }
  }

  def apply(s: SparkSession, sfDir: String): DataFrame = {
    val c = codec(s, sfDir)
    c.normalize(s.read.parquet(s"$sfDir/events.parquet"))
  }
}
