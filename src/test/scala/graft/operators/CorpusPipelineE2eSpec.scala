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
