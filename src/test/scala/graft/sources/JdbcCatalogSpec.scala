package graft.sources

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** S3/J3 end-to-end against embedded Derby (the only JDBC engine on the
  * offline classpath): the computed-spots projection and run IN-list must
  * execute inside the database — Spark sees only the 4-column slice — and
  * quoted accessions must be escaped, not interpolated raw.
  *
  * Derby folds unquoted identifiers to upper case (Postgres folds to
  * lower), so column checks here are case-insensitive; the subquery text
  * itself is dialect-portable.
  */
class JdbcCatalogSpec extends AnyFunSuite {

  private val url = "jdbc:derby:memory:graftcat;create=true"

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .appName("jdbc-catalog-spec")
    .getOrCreate()

  private def setupDb(): Unit = {
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute(
      """CREATE TABLE srarun (
        |  bio_project VARCHAR(32), bio_sample VARCHAR(32),
        |  run VARCHAR(32), mbases DOUBLE, avgspotlen DOUBLE)""".stripMargin)
    // R3 is absent from the requested runs; R'4 carries an embedded quote
    st.execute("INSERT INTO srarun VALUES " +
      "('bp1','BS1','R1', 10.0, 100.0)," +
      "('bp1','BS2','R2', 20.0, 200.0)," +
      "('bp2','BS3','R3', 30.0, 300.0)," +
      "('bp2','BS4','R''4', 40.0, 400.0)")
    st.close()
    conn.close()
  }

  test("fromJdbc pushes projection + IN-list into the database and " +
      "escapes quoted accessions") {
    setupDb()
    val df = JdbcCatalog.fromJdbc(spark, url, new Properties(), "srarun",
      Seq("R1", "R2", "R'4"))

    // schema: exactly the 4-column slice (computed spots, no mbases/
    // avgspotlen — proof the projection ran in-database)
    assert(df.columns.map(_.toLowerCase).toSeq ===
      Seq("bio_project", "bio_sample", "run", "spots"))

    // the scan relation IS the pushed-down subquery
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("catalog_slice"))

    val rows = df.collect().map { r =>
      (r.getString(0), r.getString(2), r.getDouble(3))
    }.sortBy(_._2)
    // IN-list filtered in-database: R3 never crosses the wire
    assert(rows.map(_._2).toSet === Set("R1", "R2", "R'4"))
    // computed spots = mbases*1e6/avgspotlen (main/mwas_general.py:47)
    assert(rows.map(_._3).toSeq === Seq(100000.0, 100000.0, 100000.0))
  }

  test("sqlLiteral doubles embedded quotes") {
    assert(JdbcCatalog.sqlLiteral("R1") === "'R1'")
    assert(JdbcCatalog.sqlLiteral("R'; DROP TABLE x--") ===
      "'R''; DROP TABLE x--'")
  }
}
