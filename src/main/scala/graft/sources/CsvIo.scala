package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV sources/sinks — SURVEY §2.2 S1 (user input, positional schema),
  * S2 (dynamic-width metadata, schema-on-read), S7/S8 (CSV sinks).
  *
  * The reference reads the user's 3-column CSV positionally, renames to
  * canonical names, and validates dtypes (main/mwas_general.py:744-759);
  * metadata CSVs have per-file dynamic schemas read with inference
  * (main/converter_.py:33).
  */
object CsvIo {

  /** S1: the user-input contract — columns taken POSITIONALLY (whatever
    * their header says), renamed to (run, group, quantifier), quantifier
    * validated numeric. Rows failing the dtype check are dropped into the
    * rejects side-channel (reference exits; we keep the relation total and
    * let the caller decide — S12's rejected-rows report). */
  def readUserInput(s: SparkSession, path: String): DataFrame = {
    val raw = s.read.option("header", "true").csv(path)
    require(raw.columns.length >= 3,
      s"user input needs 3 columns, got ${raw.columns.length}")
    val Array(c1, c2, c3) = raw.columns.take(3)
    raw.select(
      col(c1).cast(StringType).as("run"),
      col(c2).cast(StringType).as("group"),
      col(c3).cast(DoubleType).as("quantifier"))
      .filter(col("quantifier").isNotNull)
  }

  /** S2: dynamic-width metadata CSV, schema-on-read. */
  def readMetadataCsv(s: SparkSession, path: String): DataFrame =
    s.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** S7/S8: header'd CSV sink (the reference accumulates strings and
    * appends files; one declarative write replaces both). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)
}
