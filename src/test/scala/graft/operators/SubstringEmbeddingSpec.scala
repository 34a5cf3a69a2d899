package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic contracts for the round-12 continuation operators on
  * constructed fixtures (cross-engine value agreement is the DuckDB
  * oracle's job):
  *   - dedup_substring: cross-doc repetition counts, WITHIN-doc repetition
  *     does not, max_df tracks the most widely shared gram.
  *   - emb_project_rp: basis vectors read the pinned sign matrix back out
  *     (projection is exactly scale·r_k[d] on e_d).
  *   - emb_quantize_int8: known bounds → known codes; constant dims code
  *     to 0; saturation counts the clipped dims.
  */
class SubstringEmbeddingSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("substring-embedding-spec")
    .getOrCreate()

  private def tmp(tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(tag).toString
    graft.core.TempDirs.cleanOnExit(java.nio.file.Paths.get(dir))
    dir
  }

  test("dedup_substring: cross-doc grams count, self-repeats do not") {
    import spark.implicits._
    val dir = tmp("substr_spec")
    // doc 0 and 1 share the 5-word sentence (3 shared trigrams); doc 2 is
    // disjoint; doc 3 repeats ITS OWN trigram twice but shares nothing.
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "one alpha beta gamma delta epsilon two"),
      (2L, "completely different words only here"),
      (3L, "x y z x y z"))
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = SubstringQueries.dedupSubstring(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap

    // doc 0: 4 trigrams, 3 of them inside doc 1 ("alpha beta gamma",
    // "beta gamma delta", "gamma delta epsilon")
    assert(out(0L) == ((4L, 3L, 0.75, 2L)), s"doc0=${out(0L)}")
    // doc 1: 5 trigrams, the same 3 shared
    assert(out(1L)._1 == 5L && out(1L)._2 == 3L, s"doc1=${out(1L)}")
    // doc 2: nothing shared
    assert(out(2L)._2 == 0L && out(2L)._4 == 1L, s"doc2=${out(2L)}")
    // doc 3: its distinct trigram set {x y z, y z x, z x y, x y z} has
    // 3 DISTINCT members, none cross-doc — self-repetition is invisible
    assert(out(3L) == ((3L, 0L, 0.0, 1L)), s"doc3=${out(3L)}")
  }

  test("dedup_substring_spans: interval union of repeated 3-gram spans") {
    import spark.implicits._
    val dir = tmp("spans_spec")
    // docs 0 and 1 share two 5-word blocks (a1..a5, b1..b5) placed at
    // different offsets; doc 2 is disjoint. Per shared block: repeated
    // positions p, p+1, p+2 → covered = 3 + 1 + 1 = 5 tokens.
    val docs = Seq(
      (0L, "a1 a2 a3 a4 a5 u1 u2 u3 b1 b2 b3 b4 b5"),
      (1L, "a1 a2 a3 a4 a5 x1 x2 b1 b2 b3 b4 b5"),
      (2L, "z1 z2 z3 z4"))
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = SubstringQueries.dedupSubstringSpans(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(0L) == ((13L, 6L, 10L, 0.769231)), s"doc0=${out(0L)}")
    assert(out(1L) == ((12L, 6L, 10L, 0.833333)), s"doc1=${out(1L)}")
    assert(out(2L) == ((4L, 0L, 0L, 0.0)), s"doc2=${out(2L)}")

    // the rewrite deletes exactly those spans and nothing else
    val rw = SubstringQueries.dedupSubstringRewrite(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(rw(0L) == ((10L, "u1 u2 u3")), s"doc0=${rw(0L)}")
    assert(rw(1L) == ((10L, "x1 x2")), s"doc1=${rw(1L)}")
    assert(rw(2L) == ((0L, "z1 z2 z3 z4")), s"doc2=${rw(2L)}")
  }

  test("emb_project_rp: basis vector e_d reads the sign matrix back out") {
    import spark.implicits._
    val dir = tmp("rp_spec")
    // e_0 and e_5: projection p_k must equal scale * rpSign(k, d) exactly
    val basis = Seq(0, 5).zipWithIndex.map { case (d, id) =>
      (id.toLong, Seq.tabulate(64)(i => if (i == d) 1.0f else 0.0f), 0)
    }
    basis.toDF("vec_id", "embedding", "label").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val rows = EmbeddingQueries.embProjectRp(spark, dir).collect()
    val scale = EmbeddingQueries.rpScale
    for ((d, id) <- Seq(0, 5).zipWithIndex; k <- 0 until 8) {
      val got = rows(id).getDouble(2 + k)
      val want = BigDecimal(EmbeddingQueries.rpSign(k, d) * scale)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got == want, s"e_$d p$k: got $got want $want")
    }
    // the pinned matrix is Achlioptas-sparse: signs hit all of {-1,0,1}
    val signs = (0 until 8).flatMap(k => (0 until 64).map(d =>
      EmbeddingQueries.rpSign(k, d))).toSet
    assert(signs == Set(-1.0, 0.0, 1.0))
  }

  test("emb_project_rp: projected NN stays in-cluster where structure exists") {
    // The JL claim made executable where it actually binds: on a
    // clustered corpus (20 tight clusters of 5), the 8-dim projected
    // top-1 neighbor of every vector is a SAME-cluster member. (The
    // driver's embeddings fixture is isotropic noise — cosine margins
    // ~N(0, 1/64), no neighbor structure for ANY 8-dim sketch to
    // preserve — so the gate lives on constructed structure, the
    // AnnRecallSpec convention.) Deterministic: seeded fixture + the
    // pinned matrix.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = tmp("rp_recall")
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(20)(Array.fill(64)(rnd.nextGaussian()))
    val rows = for (c <- 0 until 20; m <- 0 until 5) yield {
      val v = centers(c).map(x => (x + 0.05 * rnd.nextGaussian()).toFloat)
      ((c * 5 + m).toLong, v.toSeq, c)
    }
    rows.toDF("vec_id", "embedding", "label").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val proj = EmbeddingQueries.embProjectRp(spark, dir)
      .select(col("vec_id"),
        array((0 until 8).map(k => col(s"p$k")): _*).as("pv"))
    val dot = graft.functions.VectorOps.dot_product(col("qv"), col("pv"))
    val nrm = (c: org.apache.spark.sql.Column) =>
      sqrt(graft.functions.VectorOps.dot_product(c, c))
    val top1 = proj.select(col("vec_id").as("q"), col("pv").as("qv"))
      .join(proj, col("q") =!= col("vec_id"))
      .withColumn("cos", dot / (nrm(col("qv")) * nrm(col("pv"))))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q"))
          .orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rk") === 1)
      .select(col("q"), col("vec_id")).collect()
    val inCluster = top1.count(r => r.getLong(0) / 5 == r.getLong(1) / 5)
    assert(inCluster == 100,
      s"projected top-1 left its cluster: $inCluster/100 stayed")
  }

  test("emb_quantize_int8: known bounds, constant dim, saturation") {
    import spark.implicits._
    val dir = tmp("quant_spec")
    // dim 0 constant 7.0 everywhere (code 0); other dims span [0, 1]
    def vec(x: Float) = Seq.tabulate(64)(i => if (i == 0) 7.0f else x)
    Seq((0L, vec(0.0f), 0), (1L, vec(1.0f), 0), (2L, vec(0.5f), 0))
      .toDF("vec_id", "embedding", "label").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val out = EmbeddingQueries.embQuantizeInt8(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

    val (c0, mn0, mx0, sat0) = out(0L)
    assert(c0.split("; ").forall(_ == "0") && sat0 == 0L, s"v0=$c0")
    assert(mn0 == 0L && mx0 == 0L)
    val (c1, _, mx1, sat1) = out(1L)
    // 63 spanning dims clip to 255; the constant dim stays 0
    assert(mx1 == 255L && sat1 == 63L, s"v1 mx=$mx1 sat=$sat1")
    assert(c1.startsWith("0; ") && c1.endsWith("; 255"), s"v1=$c1")
    val (c2, _, _, _) = out(2L)
    // 0.5 → floor(127.5) = 127 on every spanning dim
    assert(c2 == ("0" +: Seq.fill(63)("127")).mkString("; "), s"v2=$c2")
  }
}
