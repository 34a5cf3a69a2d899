package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the native shingling expressions: value parity
  * with the HOF chain they replaced, the null-in/empty-out guarantee,
  * and the sorted-distinct input gate on the Jaccard merge. */
class ShingleOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .appName("shingle-ops-spec")
    .getOrCreate()

  test("ngram_hashes matches xxhash64 over space-joined grams") {
    import spark.implicits._
    val df = Seq("the quick brown fox jumps", "a b a b a").toDF("text")
      .withColumn("words", split(col("text"), " "))
    // reference chain: every 3-word window, space-joined, xxhash64(seed 42).
    // Guard to >= 3 words: sequence(1, 0) yields [1,0] (descending step),
    // not [], so the chain is only valid for inputs with at least one gram —
    // short inputs are covered by the dedicated test below.
    val expected = df.filter(size(col("words")) >= 3)
      .select(col("text"), explode(sequence(lit(1),
        size(col("words")) - 2)).as("i"), col("words"))
      .select(col("text"),
        xxhash64(concat_ws(" ",
          element_at(col("words"), col("i")),
          element_at(col("words"), col("i") + 1),
          element_at(col("words"), col("i") + 2))).as("h"))
      .groupBy("text").agg(sort_array(collect_set(col("h"))).as("hs"))
    val actual = df.select(col("text"),
      ShingleOps.ngram_hashes(col("words"), 3).as("hs"))
    val exp = expected.collect().map(r =>
      r.getString(0) -> r.getSeq[Long](1)).toMap
    actual.collect().foreach { r =>
      assert(r.getSeq[Long](1) == exp(r.getString(0)))
    }
  }

  test("ngram_hashes matches the HOF chain on a randomized corpus") {
    import spark.implicits._
    // seeded generator: word counts 0..12, words drawn from a pool that
    // includes unicode, punctuation-bearing and repeated tokens (repeats
    // make duplicate grams, exercising the distinct), plus hand-picked
    // edge rows
    val rnd = new scala.util.Random(99)
    val pool = Vector("a", "b", "cat", "Σ", "naïve", "x;y", "…", "b", "a")
    val gen = (1 to 200).map { _ =>
      (0 until rnd.nextInt(13)).map(_ => pool(rnd.nextInt(pool.size)))
        .mkString(" ")
    }
    val edge = Seq("", "one", "one two", "a a a a a a", "Σ Σ Σ Σ")
    for (n <- Seq(2, 3, 5)) {
      val df = (gen ++ edge).zipWithIndex.toDF("text", "id")
        .withColumn("words", split(col("text"), " "))
      val expected = df.filter(size(col("words")) >= n)
        .select(col("id"), explode(sequence(lit(1),
          size(col("words")) - (n - 1))).as("i"), col("words"))
        .select(col("id"), xxhash64(concat_ws(" ",
          (0 until n).map(k => element_at(col("words"), col("i") + k)): _*))
          .as("h"))
        .groupBy("id").agg(sort_array(collect_set(col("h"))).as("hs"))
      val exp = expected.collect()
        .map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
      df.select(col("id"), ShingleOps.ngram_hashes(col("words"), n).as("hs"))
        .collect().foreach { r =>
          val want = exp.getOrElse(r.getInt(0), Seq.empty[Long])
          assert(r.getSeq[Long](1) == want,
            s"n=$n id=${r.getInt(0)} drift")
        }
    }
  }

  test("null array ELEMENTS are skipped exactly like concat_ws (r9: a " +
      "null used to hash as an empty word WITH its separator)") {
    import spark.implicits._
    // arrays with null/empty elements: split() never produces these, but
    // the declared contract is value-identity with the concat_ws chain,
    // which drops nulls (no separator) yet KEEPS empty strings (joined)
    val df = Seq(
      (1, Seq[String]("a", null, "b")),
      (2, Seq[String](null, "a", "b")),
      (3, Seq[String]("", "a", "b")), // leading EMPTY word keeps its join
      (4, Seq[String](null, null, null))).toDF("id", "words")
    val expected = df
      .select(col("id"), xxhash64(concat_ws(" ",
        element_at(col("words"), 1), element_at(col("words"), 2),
        element_at(col("words"), 3))).as("h"))
      .groupBy("id").agg(sort_array(collect_set(col("h"))).as("hs"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    df.select(col("id"), ShingleOps.ngram_hashes(col("words"), 3).as("hs"))
      .collect().foreach { r =>
        assert(r.getSeq[Long](1) == expected(r.getInt(0)),
          s"id=${r.getInt(0)} null-element drift")
      }
  }

  test("ngram_hashes is non-null for null and short inputs") {
    import spark.implicits._
    val df = Seq(Some("one two"), None).toDF("text")
      .withColumn("words", split(col("text"), " "))
      .select(ShingleOps.ngram_hashes(col("words"), 3).as("hs"))
    assert(!df.schema("hs").nullable)
    val rows = df.collect()
    assert(rows.length == 2)
    // both rows: empty array, never NULL (2 words < n=3; null text)
    rows.foreach(r => assert(!r.isNullAt(0) && r.getSeq[Long](0).isEmpty))
    // size() arithmetic over the column never sees NULL
    val sizes = Seq(Some("a b c d"), None).toDF("text")
      .withColumn("words", split(col("text"), " "))
      .select(size(ShingleOps.ngram_hashes(col("words"), 3)).as("n"))
      .collect().map(_.getInt(0)).sorted
    assert(sizes.toSeq == Seq(0, 2))
  }

  test("sorted_jaccard computes |A∩B|/|A∪B| on sorted distinct arrays") {
    import spark.implicits._
    val df = Seq(
      (Array(1L, 2L, 3L, 4L), Array(3L, 4L, 5L, 6L), 2.0 / 6.0),
      (Array(1L, 2L), Array(1L, 2L), 1.0),
      (Array.emptyLongArray, Array.emptyLongArray, 0.0))
      .toDF("a", "b", "want")
    df.select(ShingleOps.sorted_jaccard(col("a"), col("b")).as("got"),
        col("want"))
      .collect().foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("sorted_jaccard rejects nullable-element arrays") {
    import spark.implicits._
    val df = Seq((Array[java.lang.Long](1L, null), Array[java.lang.Long](1L)))
      .toDF("a", "b")
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(ShingleOps.sorted_jaccard(col("a"), col("b"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("sorted_long_jaccard") ||
      err.getMessage.contains("NOT NULL"))
  }
}
