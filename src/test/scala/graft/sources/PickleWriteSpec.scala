package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Write-side S10 gates: graft-written `.mwaspkl` files round-trip
  * through the graft VM back to the exact relation, sentinels follow the
  * converter's 1-byte contract, and the constructor-form DataFrame dump
  * is the layout [[PickleWrite]] documents. Real-pandas loadability is
  * the job of `tools/picklecheck.py` (pandas is a driver-side tool, not
  * a test dependency). */
class PickleWriteSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("pickle-write-spec")
    .getOrCreate()

  private val fixtures =
    new java.io.File("src/test/resources/mwaspkl").getAbsolutePath

  test("encode/parse unit round trip, including unicode and big indexes") {
    val p = PickleCompat.ProjectPickle("PRJX", "ok",
      biosamples = Seq("SAM1", "SAM2", "SAMé✓"),
      attributes = Seq("attr; a", "b"),
      values = Seq("v\nwith newline", "émoji 🦠"),
      index_lists = Seq(Seq(0, 2), Seq(1)),
      includes = Seq(true, false))
    val back = PickleCompat.parse("PRJX", PickleWrite.encodeProject(p))
    assert(back == p)
    // a big ref list pushes ints past BININT1/BININT2 boundaries
    val big = PickleCompat.ProjectPickle("PRJB", "ok",
      biosamples = (0 until 70000).map(i => s"S$i"),
      attributes = Seq("a"), values = Seq("v"),
      index_lists = Seq(Seq(0, 255, 256, 65535, 65536, 69999)),
      includes = Seq(true))
    assert(PickleCompat.parse("PRJB", PickleWrite.encodeProject(big)) == big)
  }

  test("sentinel statuses write the converter's 1-byte files") {
    val empty = PickleCompat.ProjectPickle("P0", "empty",
      Nil, Nil, Nil, Nil, Nil)
    val black = PickleCompat.ProjectPickle("P1", "blacklisted",
      Nil, Nil, Nil, Nil, Nil)
    assert(PickleWrite.encodeProject(empty).toSeq == Seq('0'.toByte))
    assert(PickleWrite.encodeProject(black).toSeq == Seq('1'.toByte))
    assert(PickleCompat.parse("P0",
      PickleWrite.encodeProject(empty)).status == "empty")
    assert(PickleCompat.parse("P1",
      PickleWrite.encodeProject(black)).status == "blacklisted")
  }

  test("corpus round trip: read fixtures -> write -> read back identical") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_pickle_write").toString
    val original = PickleCompat.readProjects(spark, fixtures)
    PickleWrite.writeProjects(original, out)
    val back = PickleCompat.readProjects(spark, out)
      .collect().map(p => p.bioproject -> p).toMap
    original.collect().foreach { p =>
      // an ok-status project with zero sets legitimately degrades to the
      // '0' sentinel (the converter's own rule for no-set inputs)
      if (p.status == "ok" && p.attributes.isEmpty)
        assert(back(p.bioproject).status == "empty")
      else assert(back(p.bioproject) == p, s"mismatch at ${p.bioproject}")
    }
    // the written tree is also readable through the DataSource V2 path
    val v2 = spark.read.format("mwaspkl").load(out)
    assert(v2.count() ==
      spark.read.format("mwaspkl").load(fixtures).count())
  }
}
