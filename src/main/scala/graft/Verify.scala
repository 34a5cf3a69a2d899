package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name filter (local iteration)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the engine runs with its own extensions installed (custom SQL
      // functions + the LevenshteinPrefilter optimizer rule) — the
      // correctness gate exercises the production session posture
      .withExtensions(new graft.extensions.GraftExtensions())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional deployment profile (VERDICT r12 item 4): the correctness
    // surface must be provable UNDER the 100 TB geometry — config must
    // never change results. Same contract as Bench.
    sys.env.get("SPARK_GRAFT_PROFILE").foreach { name =>
      val p = graft.core.ClusterProfile.named(name)
      p.applyTo(spark)
      System.err.println(s"VERIFY PROFILE $name -> " + p.confs.toSeq.sorted
        .map { case (k, v) => s"$k=$v" }.mkString(", "))
    }
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness
    def q(s: String): String = graft.core.JsonUtil.escape(s)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
