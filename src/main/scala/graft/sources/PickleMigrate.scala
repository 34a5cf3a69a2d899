package graft.sources

import org.apache.spark.sql.SparkSession

/** One-time corpus migration CLI — the day-one adoption path for a user
  * with the reference's ~196k-file `.mwaspkl` tree (SURVEY §2.2 S4):
  *
  *   PickleMigrate <pickleDir> <outDir>
  *
  * writes `<outDir>/biosample_ref` (bioproject, idx, biosample_id) and
  * `<outDir>/metadata_sets` (the condenser's exact output schema, set_id
  * included), partitioned only by parquet's own row groups — downstream
  * reads filter on `bioproject`, and both relations are small relative to
  * the data they describe. After this runs once, [[graft.mwas.MwasCli]] /
  * [[graft.mwas.MwasServer]] take `<outDir>/metadata_sets` directly and
  * the pickles are never read again.
  */
object PickleMigrate {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PickleMigrate <pickleDir> <outDir>")
    val Array(inDir, outDir) = args.take(2)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER",
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .appName("pickle-migrate")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ref = PickleCompat.biosampleRef(spark, inDir)
    ref.write.mode("overwrite").parquet(s"$outDir/biosample_ref")
    val sets = PickleCompat.condensedSets(spark, inDir)
    sets.write.mode("overwrite").parquet(s"$outDir/metadata_sets")

    val statuses = PickleCompat.readProjects(spark, inDir)
      .groupBy("status").count().collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(", ")
    println(s"[pickle-migrate] $statuses; " +
      s"sets=${spark.read.parquet(s"$outDir/metadata_sets").count()} " +
      s"ref_rows=${spark.read.parquet(s"$outDir/biosample_ref").count()} " +
      s"-> $outDir")
    spark.stop()
  }
}
