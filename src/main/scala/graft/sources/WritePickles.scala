package graft.sources
import org.apache.spark.sql.SparkSession
/** Export CLI — the inverse of [[PickleMigrate]]: write a `.mwaspkl`
  * tree (one pickle per bioproject, converter sentinel rules) from any
  * corpus the graft readers produce, for hand-back to legacy reference
  * tooling. `tools/picklecheck.py` gates the output against real pandas.
  * Usage: sbt "runMain graft.sources.WritePickles <inDir> <outDir>" */
object WritePickles {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    PickleWrite.writeProjects(
      PickleCompat.readProjects(s, args(0)), args(1))
    println(s"[write-pickles] wrote to ${args(1)}")
    s.stop()
  }
}
