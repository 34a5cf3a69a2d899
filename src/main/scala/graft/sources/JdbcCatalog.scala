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
  * No Postgres exists in the offline environment; [[fromJdbc]] is
  * exercised end-to-end against embedded Derby (JdbcCatalogSpec) —
  * projection, computed spots, and IN-list pushdown all execute
  * in-database there exactly as they would against Postgres.
  * [[fromParquet]] is the equivalent over a catalog export (what the
  * driver testdata stands in for). Both return the same schema, so the
  * pipeline is source-agnostic.
  */
object JdbcCatalog {

  /** Escape a string for inclusion in a standard SQL string literal: the
    * only metacharacter inside '…' is the quote itself, doubled. (The
    * reference interpolates accessions unescaped, main/mwas_general.py:173
    * — an accession containing a quote would break or inject there.) */
  private[sources] def sqlLiteral(v: String): String =
    "'" + v.replace("'", "''") + "'"

  /** The catalog slice via JDBC with the computed-spots projection and
    * run-list pushdown happening in-database (the reference formats the
    * same IN-list into its Postgres query, main/mwas_general.py:173,178).
    * Accessions are escaped as SQL literals, so untrusted run ids are
    * safe. */
  def fromJdbc(s: SparkSession, url: String, props: Properties,
      table: String, runs: Seq[String]): DataFrame = {
    val inList = runs.map(sqlLiteral).mkString(", ")
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
