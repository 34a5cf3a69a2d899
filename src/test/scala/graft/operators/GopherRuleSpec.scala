package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Boundary gates for the Gopher rule battery: each rule exercised at
  * its exact threshold on hand-designed documents (the fixture corpus
  * is single-line prose that passes the line/symbol rules vacuously, so
  * the designed docs are where those rules are actually proven). */
class GopherRuleSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .appName("gopher-rule-spec")
    .getOrCreate()

  /** Write docs as parquet in the documents.parquet layout and run the
    * registered query against the temp dir. */
  private def run(docs: Seq[(Long, String)]): Map[Long, Map[String, Boolean]] = {
    import spark.implicits._
    val dir = Files.createTempDirectory("gopher_spec").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val df = QualityModelQueries.qualityGopher(spark, dir)
    val flagCols = df.columns.filter(c => c.startsWith("r_") || c == "keep")
    df.collect().map { r =>
      r.getLong(0) -> flagCols.map(c => c -> r.getAs[Boolean](c)).toMap
    }.toMap
  }

  // 50 words incl. two Gopher stopwords, mean length inside [3,10]
  private val goodText =
    (Seq("the", "with") ++ Seq.fill(48)("word")).mkString(" ")

  test("word-count rule: 49 words fails, 50 passes") {
    val w49 = (Seq("the", "with") ++ Seq.fill(47)("word")).mkString(" ")
    val got = run(Seq((1L, w49), (2L, goodText)))
    assert(!got(1L)("r_wordcount") && !got(1L)("keep"))
    assert(got(2L)("r_wordcount") && got(2L)("keep"))
  }

  test("mean word length: exactly 3 and exactly 10 pass, outside fails") {
    val m3 = Seq.fill(50)("the").mkString(" ") // mean exactly 3
    val m10 = (Seq("the", "with") ++
      Seq.fill(48)("abcdefghijk")).mkString(" ") // (3+4+48*11)/50 = 10.7
    val m2 = (Seq("the", "to") ++ Seq.fill(48)("ab")).mkString(" ")
    val got = run(Seq((1L, m3), (2L, m10), (3L, m2)))
    assert(got(1L)("r_meanwordlen"))
    assert(!got(2L)("r_meanwordlen"))
    assert(!got(3L)("r_meanwordlen"))
  }

  test("symbol ratio: 5 hashes in 50 words passes, 6 fails") {
    val s5 = (Seq("the", "with") ++ Seq.fill(43)("word") ++
      Seq.fill(5)("#tag")).mkString(" ")
    val s6 = (Seq("the", "with") ++ Seq.fill(42)("word") ++
      Seq.fill(6)("#tag")).mkString(" ")
    val got = run(Seq((1L, s5), (2L, s6)))
    assert(got(1L)("r_symbolratio"))
    assert(!got(2L)("r_symbolratio"))
  }

  test("bullet and ellipsis line rules fire on multi-line docs") {
    // 10 lines, all bullet-led -> bullet rule fails; none ellipsis-ended
    val allBullets = (1 to 10).map(i => s"- item $i the with")
      .mkString("\n") + " " + Seq.fill(30)("word").mkString(" ")
    // 10 lines, 4 ellipsis-ended (40% > 30%)
    val manyEllipsis = ((1 to 4).map(i => s"line $i trails off...") ++
      (5 to 10).map(i => s"line $i is fine")).mkString("\n") +
      " the with " + Seq.fill(20)("word").mkString(" ")
    val got = run(Seq((1L, allBullets), (2L, manyEllipsis)))
    assert(!got(1L)("r_bulletlines"))
    assert(got(1L)("r_ellipsislines"))
    assert(!got(2L)("r_ellipsislines"))
    assert(got(2L)("r_bulletlines"))
  }

  test("alpha-word and stopword rules at their boundaries") {
    // 40 alpha words of 50 = exactly 80% passes; 39 fails
    val a40 = (Seq("the", "with") ++ Seq.fill(38)("word") ++
      Seq.fill(10)("123")).mkString(" ")
    val a39 = (Seq("the", "with") ++ Seq.fill(37)("word") ++
      Seq.fill(11)("123")).mkString(" ")
    // exactly one distinct stopword (repeated!) fails; two pass
    val oneStop = (Seq.fill(10)("the") ++ Seq.fill(40)("word")).mkString(" ")
    val got = run(Seq((1L, a40), (2L, a39), (3L, oneStop)))
    assert(got(1L)("r_alphawords"))
    assert(!got(2L)("r_alphawords"))
    assert(!got(3L)("r_stopwords"))
    assert(got(1L)("r_stopwords"))
  }
}
