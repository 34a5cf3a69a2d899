package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property gate for the two containment arms (r12): over randomly
  * generated corpora, BOTH `dedupContainment` (oracle-direct pair
  * enumeration) and `dedupContainmentPrefix` (PPJoin prefix filtering)
  * must equal an INDEPENDENT plain-Scala brute force — so the prefix
  * bound (floor(0.05·m)+1 rarest words must intersect the partner) is
  * pinned against adversarial shapes the fixed sf0.001 fixture can't
  * produce: single-word docs (C = 1.0 against any doc sharing the
  * word), all-stopword vocabularies, duplicate words in a text, ties in
  * the (df, word) prefix ordering, sources with one doc.
  */
class ContainmentPropertySpec extends Properties("DedupContainment") {

  // each sample runs two full Spark plans over a tiny corpus — keep the
  // sample count CI-sized; the generator is built to hit qualifying
  // pairs almost every sample (small distinct-word sets)
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("containment-prop")
    .getOrCreate()

  private val vocab = Vector("ax", "bx", "cx", "dx", "ex", "fx", "gx",
    "hx", "ix", "jx", "kx", "lx")

  private val genDocs: Gen[Seq[(Long, String, String)]] = for {
    nDocs <- Gen.choose(3, 12)
    nSources <- Gen.choose(1, 2)
    docs <- Gen.sequence[Seq[(Long, String, String)], (Long, String, String)](
      (0 until nDocs).map { i =>
        for {
          src <- Gen.choose(1, nSources)
          nWords <- Gen.choose(1, 10)
          words <- Gen.listOfN(nWords, Gen.oneOf(vocab))
        } yield (i.toLong, s"s$src", words.mkString(" "))
      })
  } yield docs

  /** Independent brute force over distinct word sets. */
  private def expected(docs: Seq[(Long, String, String)])
      : Set[(Long, Long, Double, Double)] = {
    val sets = docs.map { case (id, src, text) =>
      (id, src, text.split(" ").filter(_.nonEmpty).toSet)
    }
    (for {
      a <- sets; b <- sets
      if a._2 == b._2 && a._1 < b._1
      inter = (a._3 & b._3).size
      if inter > 0
      c = inter.toDouble / math.min(a._3.size, b._3.size)
      if c >= 0.95
    } yield (a._1, b._1, c,
      inter.toDouble / (a._3.size + b._3.size - inter))).toSet
  }

  private def run(
      arm: (SparkSession, String) => org.apache.spark.sql.DataFrame,
      dir: String): Set[(Long, Long, Double, Double)] =
    arm(spark, dir)
      .select("doc_a", "doc_b", "containment", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSet

  property("both arms equal the plain-Scala brute force") =
    Prop.forAll(genDocs) { docs =>
      import spark.implicits._
      val dir = java.nio.file.Files
        .createTempDirectory("containment_prop").toString
      graft.core.TempDirs.cleanOnExit(java.nio.file.Paths.get(dir))
      docs.toDF("doc_id", "source", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val exp = expected(docs)
      val exact = run(DedupQueries.dedupContainment, dir)
      val prefix = run(DedupQueries.dedupContainmentPrefix, dir)
      if (exact != exp || prefix != exp)
        println(s"docs=$docs\nexp=$exp\nexact=$exact\nprefix=$prefix")
      exact == exp && prefix == exp
    }
}
