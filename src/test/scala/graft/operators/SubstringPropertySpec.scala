package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property gate for the substring-dedup family: over random corpora
  * (docs shorter than one gram, empty-string tokens from doubled
  * spaces, heavy duplication, single-doc corpora), all three operators
  * must equal a plain-Scala brute force. The DuckDB oracle proves
  * cross-engine equality on corpus fixtures; this pins the SEMANTICS on
  * adversarial shapes the fixtures can't produce. */
class SubstringPropertySpec extends Properties("SubstringQueries") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("substring-prop")
    .getOrCreate()

  // "" in the vocab → doubled spaces in the text, the split artifact class
  private val vocab = Vector("aa", "bb", "cc", "dd", "")

  private val genDocs: Gen[Seq[(Long, String)]] = for {
    nDocs <- Gen.choose(2, 8)
    docs <- Gen.sequence[Seq[(Long, String)], (Long, String)](
      (0 until nDocs).map { i =>
        for {
          n <- Gen.choose(0, 8)
          ws <- Gen.listOfN(n, Gen.oneOf(vocab))
        } yield (i.toLong, ws.mkString(" "))
      })
  } yield docs

  private def words(t: String): Vector[String] = t.split(" ", -1).toVector

  private def grams(ws: Vector[String]): Vector[String] =
    if (ws.length < 3) Vector.empty
    else ws.sliding(3).map(_.mkString(" ")).toVector

  private def r6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  property("coverage, spans and rewrite match a brute force") =
    Prop.forAll(genDocs) { docs =>
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("substr_prop").toString
      graft.core.TempDirs.cleanOnExit(java.nio.file.Paths.get(dir))
      docs.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")

      val byDoc = docs.map { case (id, t) => id -> words(t) }.toMap
      val gramSets = byDoc.view.mapValues(ws => grams(ws).toSet).toMap
      val df = gramSets.values.flatten.groupBy(identity)
        .map { case (g, _) => g -> gramSets.count(_._2.contains(g)) }
      val repeated = df.collect { case (g, n) if n >= 2 => g }.toSet

      // dedup_substring: docs with >= 1 gram only
      val wantCov = gramSets.collect { case (id, gs) if gs.nonEmpty =>
        val rep = gs.count(repeated)
        id -> ((gs.size.toLong, rep.toLong,
          r6(rep.toDouble / gs.size), gs.map(df).max.toLong))
      }
      val gotCov = SubstringQueries.dedupSubstring(spark, dir).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap

      // spans + rewrite from the positional relation
      val posInfo = byDoc.view.mapValues { ws =>
        val pg = grams(ws).zipWithIndex
        val repPos = pg.collect { case (g, p) if repeated(g) => p }
        val covered = repPos.flatMap(p => p to p + 2).toSet
        (ws, repPos, covered)
      }.toMap
      val wantSpans = posInfo.map { case (id, (ws, repPos, covered)) =>
        id -> ((ws.length.toLong, repPos.length.toLong, covered.size.toLong,
          if (ws.isEmpty) 0.0 else r6(covered.size.toDouble / ws.length)))
      }
      val gotSpans = SubstringQueries.dedupSubstringSpans(spark, dir)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap

      val wantRw = posInfo.map { case (id, (ws, _, covered)) =>
        val kept = ws.zipWithIndex.collect {
          case (w, p) if !covered(p) => w }
        id -> ((covered.size.toLong, kept.mkString(" ")))
      }
      val gotRw = SubstringQueries.dedupSubstringRewrite(spark, dir)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(2), r.getString(3)))).toMap

      val covOk = gotCov == wantCov
      val spansOk = gotSpans == wantSpans
      val rwOk = gotRw == wantRw
      if (!covOk) println(s"coverage MISMATCH: got=$gotCov want=$wantCov")
      if (!spansOk) println(s"spans MISMATCH: got=$gotSpans want=$wantSpans")
      if (!rwOk) println(s"rewrite MISMATCH: got=$gotRw want=$wantRw")
      covOk && spansOk && rwOk
    }
}
