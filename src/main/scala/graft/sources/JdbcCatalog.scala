package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S3: the Postgres catalog source (SURVEY §2.2).
  *
  * The reference issues `SELECT bio_project, bio_sample, run,
  * (mbases*1000000)/avgspotlen AS spots FROM srarun WHERE run IN (…)`
  * over psycopg2 (main/mwas_general.py:37-54,163-184; the join-in-db
  * variant old/mwas_rfam.py:602-608). Here the same slice is a JDBC
  * dbtable subquery, so the projection and the IN-list predicate execute
  * inside the database; Spark sees only the 4-column result.
  *
  * No database exists in the offline environment, so [[fromJdbc]] is
  * exercised only through its plan construction; [[fromParquet]] is the
  * tested equivalent over a catalog export (what the driver testdata
  * stands in for). Both return the same schema, so the pipeline is
  * source-agnostic.
  */
object JdbcCatalog {

  /** The catalog slice via JDBC with the computed-spots projection and
    * run-list pushdown happening in-database. `runs` must be pre-sanitized
    * accessions (the reference formats them into SQL the same way,
    * main/mwas_general.py:173,178). */
  def fromJdbc(s: SparkSession, url: String, props: Properties,
      table: String, runs: Seq[String]): DataFrame = {
    val inList = runs.map(r => s"'$r'").mkString(", ")
    val subquery =
      s"""(SELECT bio_project, bio_sample, run,
         |        (mbases * 1000000) / avgspotlen AS spots
         | FROM $table
         | WHERE run IN ($inList)) AS catalog_slice""".stripMargin
    s.read.jdbc(url, subquery, props)
  }

  /** The same slice from a parquet catalog export; the `runs` filter
    * becomes a broadcast semi join (an IN-list literal would blow the
    * plan past a few thousand runs). */
  def fromParquet(s: SparkSession, path: String, runs: DataFrame)
      : DataFrame = {
    val cat = s.read.parquet(path)
      .select(col("bio_project"), col("bio_sample"), col("run"),
        col("spots"))
    cat.join(broadcast(runs.select(col("run")).distinct()), Seq("run"),
      "left_semi")
  }
}
