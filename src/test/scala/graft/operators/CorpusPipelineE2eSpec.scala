package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the fused curation pipeline (`corpus_pipeline_e2e`):
  *
  *   1. ZERO LEAKAGE BY CONSTRUCTION — after component-min survivorship
  *      no J ≥ 0.7 pair exists between any two output documents at all
  *      (the audit's pair relation, driven over the output).
  *   2. EXCHANGE REUSE — inside the pair join both sides derive the
  *      same (source, word) subtree over the staged survivors, so the
  *      static plan (AQE off, the PipelineSpec precedent) must carry
  *      exactly one fresh hashpartitioning exchange on those keys and
  *      reuse it for the other side.
  *   3. Split/pack sanity: all three splits present, shards start at 0
  *      per (split, source) and are contiguous.
  */
class CorpusPipelineE2eSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("corpus-e2e-spec")
    .getOrCreate()

  test("no near-dup pair survives into the output; splits and shards " +
      "are well-formed") {
    val out = DedupQueries.corpusPipelineE2e(spark, dir).collect()
    val ids = out.map(_.getLong(0)).toSet
    assert(ids.nonEmpty)

    val pairs = DedupQueries.dedupJaccardPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture has no near-dup structure")
    val leaks = pairs.filter { case (a, b) => ids(a) && ids(b) }
    assert(leaks.isEmpty, s"near-dup pairs in output: ${leaks.take(5)}")

    // Hamilton 80/10/10 recomputed independently per source over the
    // survivor counts (the fixture is twin-dense: chained J >= 0.7
    // merges most docs per source, so n can be 1 and everything lands
    // in train — the rule, not a fixed split set, is the contract)
    out.groupBy(_.getString(1)).foreach { case (src, rows) =>
      val n = rows.length.toLong
      val ft = 8 * n / 10
      val fv = n / 10
      val r = n - ft - 2 * fv
      val rt = (8 * n) % 10
      val rv = n % 10
      val t1 = ft + (if (rt >= rv) { if (r >= 1) 1 else 0 }
        else { if (r >= 3) 1 else 0 })
      val vx = fv + (if (rt >= rv) { if (r >= 2) 1 else 0 }
        else { if (r >= 1) 1 else 0 })
      val got = rows.groupBy(_.getString(3)).view.mapValues(_.length.toLong)
      assert(got.getOrElse("train", 0L) == t1, s"$src train quota")
      assert(got.getOrElse("val", 0L) == vx, s"$src val quota")
      assert(got.getOrElse("test", 0L) == n - t1 - vx, s"$src test quota")
    }
    // shards contiguous from 0 within each (split, source)
    out.groupBy(r => (r.getString(3), r.getString(1))).foreach {
      case (k, rows) =>
        val shards = rows.map(_.getLong(6)).distinct.sorted
        assert(shards.head == 0L, s"$k first shard ${shards.head}")
        assert(shards.zipWithIndex.forall { case (v, i) => v == i },
          s"$k shards not contiguous: ${shards.toList}")
    }
  }

  test("banded edge arm equals the exact arm, and the pipeline output " +
      "is identical under both") {
    // the registered query runs the banded MinHash candidate path;
    // the ORACLE stays the exact word-Jaccard SQL — this is the local
    // proof that the two arms agree (band-miss waiver: ≤4.4e-10/pair)
    val s2 = DedupQueries.docs(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
      .localCheckpoint(true)
    val banded = DedupQueries.bandedWordEdges(s2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = DedupQueries.exactWordEdges(s2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded.nonEmpty, "fixture has no near-dup structure")
    assert(banded == exact,
      s"banded-only: ${(banded -- exact).take(5)}; " +
        s"exact-only: ${(exact -- banded).take(5)}")

    val viaBanded = DedupQueries.corpusPipelineE2e(spark, dir).collect()
      .map(_.toSeq).sortBy(_.toString)
    val viaExact = DedupQueries.corpusPipelineE2e(spark, dir,
        DedupQueries.exactWordEdges).collect()
      .map(_.toSeq).sortBy(_.toString)
    assert(viaBanded.toSeq == viaExact.toSeq)
  }

  test("the banded arm's slim band self-join reuses one exchange and " +
      "never carries the word sets into the candidate shuffle") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val s2 = DedupQueries.docs(spark, dir)
        .select(col("doc_id"), col("source"), col("text"))
        .localCheckpoint(true)
      // this fixture's identical-set dup mass (~3%) routes the DIRECT
      // arm — the r16 shape whose invariants this test pins; the
      // contracted arm has its own gate below
      val plan = DedupQueries.bandedWordEdges(s2)
        .queryExecution.executedPlan.toString
      assert(plan.linesIterator.exists(_.contains("ReusedExchange")),
        s"no ReusedExchange in the banded edge plan:\n$plan")
      // the candidate join's exchanges must be the slim signature rows:
      // a `wh` column inside any hashpartitioning exchange input means
      // the word sets are being shuffled 32x per doc
      val candidateExchanges = plan.linesIterator
        .filter(_.contains("Exchange hashpartitioning"))
        .filter(l => l.contains("band") || l.contains("bh"))
        .toSeq
      assert(candidateExchanges.nonEmpty, s"no band-bucket exchange:\n$plan")
      assert(!candidateExchanges.exists(_.contains("wh")),
        s"word sets ride the candidate shuffle:\n$candidateExchanges")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("dup-heavy corpora route the exact-dup pre-contraction: same " +
      "pair relation, one signature row per DISTINCT set") {
    import spark.implicits._
    // 8 distinct near-dup-structured texts x 5 identical copies each:
    // identical-set dup mass 0.8 >= the 0.25 gate. Word sets chosen so
    // cross-group J >= 0.7 pairs exist (expansion path exercised), and
    // each copy group is an intra clique at J = 1.0.
    val base = Seq(
      "aa bb cc dd ee ff gg hh ii jj",
      "aa bb cc dd ee ff gg hh ii kk", // J = 9/11 with the first
      "zz yy xx ww vv uu tt ss",
      "zz yy xx ww vv uu tt rr",       // J = 7/9 with the third
      "mm nn oo pp",
      "mm nn oo qq",                   // J = 3/5 < 0.7 with the fifth
      "one two three four five six",
      "unrelated words entirely here")
    val docs = for {
      (t, g) <- base.zipWithIndex
      c <- 0 until 5
    } yield ((g * 5 + c).toLong, "s1", t)
    val tmp = java.nio.file.Files
      .createTempDirectory("dup_contract").toString
    graft.core.TempDirs.cleanOnExit(java.nio.file.Paths.get(tmp))
    docs.toDF("doc_id", "source", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = DedupQueries.dedupJaccardPairs(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    // brute force over the same docs
    val sets = docs.map { case (id, _, t) => (id, t.split(" ").toSet) }
    val exp = (for {
      a <- sets; b <- sets
      if a._1 < b._1
      inter = (a._2 & b._2).size
      j = inter.toDouble / (a._2.size + b._2.size - inter)
      if j >= 0.7
    } yield (a._1, b._1, j)).toSet
    assert(got == exp,
      s"contracted∖exact=${(got -- exp).take(5)} " +
        s"exact∖contracted=${(exp -- got).take(5)}")
    assert(exp.exists(_._3 < 1.0), "no cross-group pair exercised")
    assert(exp.exists(_._3 == 1.0), "no intra-clique pair exercised")
    // the contraction reached the plan: the signature/band machinery
    // runs over the materialized distinct-set relation, so the word-set
    // derivation (ngramhashes) appears nowhere downstream of it
    val plan = DedupQueries.dedupJaccardPairs(spark, tmp)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("ngramhashes"),
      s"dup-heavy corpus did not route the contracted arm:\n$plan")
  }

  test("the pair join's (source, word) exchange is planned once and " +
      "reused for the other side") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val s2 = DedupQueries.docs(spark, dir)
        .select(col("doc_id"), col("source"), col("text"))
        .localCheckpoint(true)
      val w2 = s2.select(col("source"), col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("word"))
      val plan = DedupQueries.edgesE2e(w2)
        .queryExecution.executedPlan.toString
      // the per-doc word-count aggregate attaches to BOTH pair sides;
      // with reuse its broadcast is built once (a ReusedExchange line
      // references it) and the word explode is planned 3x — streamed
      // side, broadcast probe side, and ONE count subtree — instead of
      // the 4x a reuse-less plan would carry
      val reused = plan.linesIterator.filter(_.contains("ReusedExchange"))
        .toSeq
      assert(reused.nonEmpty, s"no ReusedExchange in the edge plan:\n$plan")
      val explodes = plan.linesIterator
        .count(_.contains("Generate explode"))
      assert(explodes == 3,
        s"word explode planned $explodes times (want 3 = reuse):\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
