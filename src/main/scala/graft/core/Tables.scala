package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the driver-provided testdata (TESTDATA.md).
  *
  * One parquet file per table under the scale-factor directory. Reads are
  * plain `spark.read.parquet` so Catalyst's ParquetScan handles column
  * pruning and predicate pushdown; at cluster scale the same call against a
  * partitioned `s3a://` prefix gets partition pruning from the FileIndex for
  * free (replacing the reference's s5cmd listing + tmpfs staging,
  * main/mwas_general.py:280-320).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
