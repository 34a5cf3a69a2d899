package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Corpus-curation operators that round out the sampling / language-model
  * side of the training-data suite:
  *
  *   - weighted_sample: deterministic priority sampling (Duffield, Lund,
  *     Thorup, JACM 2007) — per-source top-n documents by priority
  *     w/u, the weighted-without-replacement scheme whose fixed-size
  *     sample supports near-optimal unbiased subset-sum estimates. The
  *     uniform draw u derives from the house portable hash, so two
  *     cluster runs — and both engines — select the identical sample.
  *   - stream_weighted_sample: its incremental twin. A priority top-n
  *     is a bounded heap, and bounded heaps are MERGEABLE
  *     (top-n(A ∪ B) = top-n(top-n(A) ∪ top-n(B))), so each batch
  *     appends only its own per-source remnant and the readout re-runs
  *     the same operator over accumulated remnants — state is
  *     output-sized regardless of corpus volume.
  *   - lm_train_bigram: the TRAINING side of the n-gram language model
  *     the quality suite consumes (`text_lm_score` applies a frozen
  *     model; this derives one): bigram conditional probabilities with
  *     add-k smoothing, P(w2|w1) = (c12 + 0.5) / (c1 + 0.5·V).
  *   - tokenizer_fertility: per-source tokenizer health — subword
  *     tokens per whitespace word (fertility) and chars per token, the
  *     standard diagnostic for how well a tokenizer fits each corpus
  *     slice (high fertility = the slice fragments into many subwords).
  *   - emb_decontaminate: SEMANTIC eval-set contamination audit — the
  *     embedding-space complement of the n-gram `text_decontaminate`
  *     (GPT-3 appendix C / Gopher §A.3.3 audit contamination lexically;
  *     paraphrased leaks need the embedding side). Candidate pairs are
  *     bounded to shared coarse-quantizer cells exactly as in
  *     [[SemDedupQueries]], so nothing is all-pairs.
  *
  * Cross-engine exactness notes (the reason every one of these
  * hash-oracles): the priority w·2⁶⁰/(h+1) is two IEEE operations
  * (multiply, divide), each correctly rounded, over exactly-representable
  * operands — bit-identical on both engines, so the top-n boundary can
  * never straddle; the smoothing ratio's numerator/denominator are exact
  * in double (counts ≪ 2⁵³) before one correctly-rounded division; the
  * fertility ratios divide two exact int64 sums. No transcendental
  * enters any ordering or decision.
  *
  * Scale shapes: weighted_sample is one narrow projection + the
  * [[graft.plans.TopKPerGroup]] two-phase heap operator (≤ n rows per
  * (partition, source) cross the exchange); lm_train_bigram is one
  * bigram-grain map-side-combined aggregate, a reuse of that relation at
  * (w1) grain, and a scalar vocab broadcast; tokenizer_fertility is a
  * per-row map then one |sources|-row aggregate; emb_decontaminate
  * quantizes each side once, broadcasts the benchmark-sized eval side,
  * and pays one corpus-grain aggregate exchange — nothing shuffles on
  * the K-value cell key.
  */
object CurationQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  // ------------------------------------------------ weighted sampling

  private val SampleN = 20
  /** 2⁶⁰ — exactly representable in double (a power of two). */
  private val Pow60 = 1.152921504606846976e18

  /** Priority = weight · 2⁶⁰ / (h + 1) ≡ w/u with u = (h+1)/2⁶⁰ ∈ (0,1],
    * h the 60-bit portable hash of doc_id. Weight = n_chars (documents
    * carry no explicit quality weight; production swaps the column). */
  private def priority(weight: Column, key: Column): Column =
    weight.cast("double") * lit(Pow60) /
      (graft.functions.PortableHash.raw(key) + lit(1L)).cast("double")

  private def sampleBase(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("pri", priority(col("n_chars"), col("doc_id")))

  private def sampleReadout(base: DataFrame): DataFrame = {
    val top = graft.plans.TopK.perGroup(base, Seq(col("source")),
      Seq(col("pri").desc, col("doc_id").asc), SampleN)
    // rank re-derived over the ≤ |sources|·n survivor rows — trivial
    top.withColumn("rk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("pri").desc, col("doc_id"))).cast("long"))
      .select(col("source"), col("rk"), col("doc_id"),
        col("n_chars").cast("long").as("weight"))
      .orderBy(col("source"), col("rk"))
  }

  def weightedSample(s: SparkSession, dir: String): DataFrame =
    sampleReadout(sampleBase(s, dir))

  val weightedSampleSql: String =
    s"""WITH h AS (
      |  SELECT source, doc_id, n_chars,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
      |      AS BIGINT) AS hh
      |  FROM documents),
      |r AS (
      |  SELECT source, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY source ORDER BY
      |      CAST(n_chars AS DOUBLE) * 1152921504606846976.0
      |        / CAST(hh + 1 AS DOUBLE) DESC, doc_id) AS rk
      |  FROM h)
      |SELECT source, CAST(rk AS BIGINT) AS rk, doc_id,
      |  CAST(n_chars AS BIGINT) AS weight
      |FROM r WHERE rk <= $SampleN ORDER BY source, rk""".stripMargin

  /** Incremental weighted sample: per batch, keep that batch's
    * per-source top-n remnant; the union of remnants contains the true
    * top-n by the heap merge property, so the readout is exact. The
    * priority is a pure per-row function (no cross-row state), which is
    * what makes the remnant self-contained. */
  def streamWeightedSample(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StreamingQueries.{runBatches, scratchDir, stageThirds}
    val base = sampleBase(s, dir)
    val staging = stageThirds(
      "graft_stream_wsample_stage_" + graft.streaming.StreamingQueries.pathTag(dir),
      base, "doc_id")
    val store = s"${scratchDir("graft_stream_wsample", dir)}/remnants"

    runBatches(s, base.schema, staging) { batch =>
      graft.plans.TopK.perGroup(batch, Seq(col("source")),
          Seq(col("pri").desc, col("doc_id").asc), SampleN)
        .write.mode("append").parquet(store)
    }

    sampleReadout(s.read.parquet(store))
  }

  // ---------------------------------------------- bigram LM training

  /** (doc_id, ws) — the whitespace token arrays with empty tokens from
    * doubled spaces removed BEFORE any pairing, so adjacency is over
    * real words. */
  private[operators] def wordArrays(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
      filter(split(col("text"), " "), w => length(w) > 0).as("ws"))

  /** (doc_id, w1, w2) — each document's adjacent-word pairs. */
  private[operators] def bigramRel(base: DataFrame): DataFrame = {
    val n1 = greatest(size(col("ws")) - 1, lit(0))
    base
      .withColumn("a1", slice(col("ws"), lit(1), n1))
      .withColumn("a2", slice(col("ws"), lit(2), n1))
      .select(col("doc_id"), explode(arrays_zip(col("a1"), col("a2"))).as("b"))
      .select(col("doc_id"), col("b.a1").as("w1"), col("b.a2").as("w2"))
  }

  /** (w1, w2, c12) — the algebraic bigram counters: partials from
    * independent batches merge by plain sums, which is what the
    * streaming twin appends. */
  private[operators] def bigramCounts(base: DataFrame): DataFrame =
    bigramRel(base).groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))

  /** The model table: c1 = Σ_w2 c12 via a window over the
    * vocab²-bounded counter table — NOT a second corpus-grain
    * aggregate: the heavy bigram scan runs once; everything after it is
    * model-sized. */
  private[operators] def lmModel(c12: DataFrame): DataFrame =
    c12.withColumn("c1",
      sum(col("c12")).over(Window.partitionBy(col("w1"))))

  private val smoothedP: Column =
    (col("c12").cast("double") + lit(0.5)) /
      (col("c1").cast("double") + lit(0.5) * col("nv").cast("double"))

  /** Threshold + smoothing readout shared by the batch query and the
    * streaming twin (`vocab` arrives with duplicates allowed — the
    * distinct is in here). */
  private[operators] def lmReadout(c12: DataFrame,
      vocab: DataFrame): DataFrame = {
    val nv = vocab.agg(countDistinct(col("w")).as("nv"))
    lmModel(c12).crossJoin(broadcast(nv))
      .filter(col("c12") >= 3)
      .select(col("w1"), col("w2"),
        col("c12").cast("long").as("c12"),
        col("c1").cast("long").as("c1"),
        round(smoothedP, 6).as("p"))
      .orderBy(col("w1"), col("w2"))
  }

  /** Bigram conditional-probability table with add-½ smoothing,
    * P(w2|w1) = (c12 + 0.5) / (c1 + 0.5·V). c1 is derived from the
    * bigram relation itself (Σ_w2 c12), so the table is internally
    * consistent by construction; V is the distinct-token vocabulary.
    * Output bounded to c12 ≥ 3 (the model rows a consumer would keep;
    * the aggregate underneath is over everything). */
  def lmTrainBigram(s: SparkSession, dir: String): DataFrame = {
    val base = wordArrays(docs(s, dir))
    lmReadout(bigramCounts(base), base.select(explode(col("ws")).as("w")))
  }

  /** Incremental LM training — two mergeable state relations: the
    * (w1, w2) counters (partials sum) and the per-batch DISTINCT word
    * membership (set union IS the merge, state bounded at vocab size).
    * The readout merges both and replays the batch smoothing path;
    * hash-oracled against literally the batch SQL. */
  def streamLmBigram(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StreamingQueries.{runBatches, scratchDir, stageThirds}
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val staging = stageThirds(
      "graft_stream_lm_stage_" + graft.streaming.StreamingQueries.pathTag(dir), d,
      "doc_id")
    val counts = s"${scratchDir("graft_stream_lm", dir)}/counts"
    val vocab = s"${scratchDir("graft_stream_lm_vocab", dir)}/words"

    runBatches(s, d.schema, staging) { batch =>
      val base = wordArrays(batch)
      bigramCounts(base).write.mode("append").parquet(counts)
      base.select(explode(col("ws")).as("w")).distinct()
        .write.mode("append").parquet(vocab)
    }

    val merged = s.read.parquet(counts)
      .groupBy(col("w1"), col("w2")).agg(sum(col("c12")).as("c12"))
    lmReadout(merged, s.read.parquet(vocab))
  }

  /** Self-scoring perplexity — the CCNet-style LM quality signal with
    * the model trained in the same plan: each document's mean bigram
    * negative log-likelihood under the add-½ model, and its
    * perplexity 2^nll. Single-word documents have no bigrams and are
    * out of scope by construction. The corpus-grain bigram relation
    * joins the model at (w1, w2); every corpus bigram is in the model
    * (trained on the same text), so the join is inner and lossless.
    * The per-doc Σ log2 follows the text_entropy float-sum posture
    * (round-6 outputs, driftaudit guarding boundaries). */
  def lmBigramPerplexity(s: SparkSession, dir: String): DataFrame = {
    val base = wordArrays(docs(s, dir))
    val bi = bigramRel(base)
    val model = lmModel(bigramCounts(base))
    val nv = base.select(explode(col("ws")).as("w"))
      .agg(countDistinct(col("w")).as("nv"))
    val nll = -log2(smoothedP)
    // broadcast the MODEL side explicitly: both sides derive from the
    // same scan, so Catalyst's size estimate is free to pick the
    // corpus-grain side (it did — BuildLeft on `bi`), which inverts at
    // scale. The model is bounded by realized bigram TYPES; at
    // web-scale type counts past executor memory, drop the hint for a
    // shuffle join on (w1, w2) — same semantics.
    bi.join(broadcast(model), Seq("w1", "w2")).crossJoin(broadcast(nv))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(nll).as("snll"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("snll") / col("n_bigrams").cast("double"), 6)
          .as("avg_nll"),
        round(pow(lit(2.0), col("snll") / col("n_bigrams").cast("double")),
          6).as("ppl"))
      .orderBy(col("doc_id"))
  }

  val lmBigramPerplexitySql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    list_filter(string_split(text, ' '), w -> len(w) > 0) AS ws
      |  FROM documents),
      |b AS (
      |  SELECT doc_id, unnest(ws[1:len(ws)-1]) AS w1,
      |    unnest(ws[2:len(ws)]) AS w2
      |  FROM d WHERE len(ws) >= 2),
      |c AS (SELECT w1, w2, count(*) AS c12 FROM b GROUP BY 1, 2),
      |m AS (SELECT w1, w2, c12, sum(c12) OVER (PARTITION BY w1) AS c1
      |      FROM c),
      |v AS (SELECT count(DISTINCT w) AS nv
      |      FROM (SELECT unnest(ws) AS w FROM d)),
      |sc AS (
      |  SELECT b.doc_id,
      |    -log2((CAST(m.c12 AS DOUBLE) + 0.5)
      |      / (CAST(m.c1 AS DOUBLE) + 0.5 * CAST(nv AS DOUBLE))) AS nll
      |  FROM b JOIN m USING (w1, w2) CROSS JOIN v)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |  round(sum(nll) / count(*), 6) AS avg_nll,
      |  round(pow(2.0, sum(nll) / count(*)), 6) AS ppl
      |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val lmTrainBigramSql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    list_filter(string_split(text, ' '), w -> len(w) > 0) AS ws
      |  FROM documents),
      |b AS (
      |  SELECT unnest(ws[1:len(ws)-1]) AS w1, unnest(ws[2:len(ws)]) AS w2
      |  FROM d WHERE len(ws) >= 2),
      |c AS (SELECT w1, w2, count(*) AS c12 FROM b GROUP BY 1, 2),
      |u AS (SELECT w1, sum(c12) AS c1 FROM c GROUP BY 1),
      |v AS (SELECT count(DISTINCT w) AS nv
      |      FROM (SELECT unnest(ws) AS w FROM d))
      |SELECT c.w1, c.w2, CAST(c.c12 AS BIGINT) AS c12,
      |  CAST(u.c1 AS BIGINT) AS c1,
      |  round((CAST(c.c12 AS DOUBLE) + 0.5)
      |    / (CAST(u.c1 AS DOUBLE) + 0.5 * CAST(nv AS DOUBLE)), 6) AS p
      |FROM c JOIN u USING (w1) CROSS JOIN v
      |WHERE c.c12 >= 3 ORDER BY w1, w2""".stripMargin

  // -------------------------------------------- tokenizer fertility

  /** Per-source tokenizer diagnostics: fertility (subword tokens per
    * whitespace word — the BPE-ish regex tokenizer shared verbatim with
    * [[TextQueries.textTokens]]) and chars per token. */
  def tokenizerFertility(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("source"),
        size(filter(split(col("text"), " "), w => length(w) > 0))
          .cast("long").as("nw"),
        size(regexp_extract_all(col("text"), lit("\\w+|[^\\w\\s]"),
          lit(0))).cast("long").as("nt"),
        length(col("text")).cast("long").as("nc"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nw")).as("n_words"),
        sum(col("nt")).as("n_tokens"),
        sum(col("nc")).as("n_chars"))
      .select(col("source"), col("n_docs"), col("n_words"),
        col("n_tokens"), col("n_chars"),
        round(col("n_tokens").cast("double") /
          col("n_words").cast("double"), 6).as("fertility"),
        round(col("n_chars").cast("double") /
          col("n_tokens").cast("double"), 6).as("chars_per_token"))
      .orderBy(col("source"))

  val tokenizerFertilitySql: String =
    """WITH f AS (
      |  SELECT source,
      |    CAST(len(list_filter(string_split(text, ' '),
      |      w -> len(w) > 0)) AS BIGINT) AS nw,
      |    CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT)
      |      AS nt,
      |    CAST(length(text) AS BIGINT) AS nc
      |  FROM documents)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(nw) AS BIGINT) AS n_words,
      |  CAST(sum(nt) AS BIGINT) AS n_tokens,
      |  CAST(sum(nc) AS BIGINT) AS n_chars,
      |  round(CAST(sum(nt) AS DOUBLE) / CAST(sum(nw) AS DOUBLE), 6)
      |    AS fertility,
      |  round(CAST(sum(nc) AS DOUBLE) / CAST(sum(nt) AS DOUBLE), 6)
      |    AS chars_per_token
      |FROM f GROUP BY source ORDER BY source""".stripMargin

  // -------------------------------------- semantic decontamination

  private val KCells = 16 // the house frozen coarse quantizer size
  private val TauCont = 0.35 // cosine at/above which a doc is flagged

  /** Eval membership: vec_id ≡ 0 (mod 20) — a deterministic 5% stand-in
    * for a held-out benchmark set; production swaps in the real eval
    * embedding table, same plan. Candidate pairs bounded to shared
    * quantizer cells (single-probe; multi-probe over the top-p cells is
    * the recall lever at production τ, same plan shape — only the
    * assignment relation widens by p). Corpus vectors in a cell with no
    * eval mate report max_eval_cos = −1 (the semdedup convention). */
  def embDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val dot = graft.functions.VectorOps.dot_product _
    val v = Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val cents = v.filter(col("vec_id") < KCells)
      .select(col("vec_id").as("cell"), col("v").as("ce"),
        dot(col("v"), col("v")).as("csq"))
    // assignment applied PER SIDE after the eval/corpus split (membership
    // is a pure function of vec_id), so each embedding is quantized
    // exactly once — not a shared assign relation whose subtree the
    // planner would re-derive per consumer
    def assign(in: DataFrame): DataFrame = in.crossJoin(broadcast(cents))
      .withColumn("dist",
        col("nrm") * col("nrm") - lit(2.0) * dot(col("v"), col("ce")) +
          col("csq"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("cell"))))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("cell"), col("v"), col("nrm"))
    val evals = assign(v.filter(col("vec_id") % 20 === 0))
      .select(col("cell"), col("v").as("ve"), col("nrm").as("nrme"))
    val corpus = assign(v.filter(col("vec_id") % 20 =!= 0))
    // ONE corpus pass: broadcast the (benchmark-sized) eval side and
    // left-outer so eval-free cells survive with a null eval column —
    // count/max then ignore nulls. No corpus-grain self-join, and no
    // sort-merge join on the 16-value cell key (a skew bomb by design).
    corpus.join(broadcast(evals), Seq("cell"), "left_outer")
      .groupBy(col("vec_id"), col("cell"))
      .agg(count(col("ve")).as("n_eval_cell"),
        max(dot(col("v"), col("ve")) / (col("nrm") * col("nrme"))).as("mc"))
      .select(col("vec_id"), col("cell"), col("n_eval_cell"),
        round(coalesce(col("mc"), lit(-1.0)), 6).as("max_eval_cos"),
        when(coalesce(col("mc"), lit(-1.0)) >= TauCont, lit(1L))
          .otherwise(lit(0L)).as("contaminated"))
      .orderBy(col("vec_id"))
  }

  val embDecontaminateSql: String =
    s"""WITH n AS (SELECT vec_id, embedding::DOUBLE[] AS e,
      |        sqrt(list_sum(list_transform(embedding::DOUBLE[],
      |          x -> x * x))) AS nrm
      |      FROM embeddings),
      |c AS (SELECT vec_id AS cell, e AS ce,
      |        list_sum(list_transform(e, x -> x * x)) AS csq
      |      FROM n WHERE vec_id < $KCells),
      |rk AS (SELECT n.vec_id, c.cell, n.e, n.nrm,
      |         row_number() OVER (PARTITION BY n.vec_id ORDER BY
      |           n.nrm * n.nrm
      |             - 2.0 * list_sum(list_transform(list_zip(n.e, c.ce),
      |                 z -> z[1] * z[2]))
      |             + c.csq, c.cell) AS r
      |       FROM n CROSS JOIN c),
      |a AS (SELECT vec_id, cell, e, nrm FROM rk WHERE r = 1),
      |sims AS (SELECT x.vec_id, count(*) AS n_eval_cell,
      |           max(list_sum(list_transform(list_zip(x.e, p.e),
      |             z -> z[1] * z[2])) / (x.nrm * p.nrm)) AS mc
      |         FROM a x JOIN a p ON x.cell = p.cell
      |           AND p.vec_id % 20 = 0
      |         WHERE x.vec_id % 20 <> 0
      |         GROUP BY x.vec_id)
      |SELECT a.vec_id, a.cell,
      |       CAST(coalesce(s.n_eval_cell, 0) AS BIGINT) AS n_eval_cell,
      |       round(coalesce(s.mc, -1.0), 6) AS max_eval_cos,
      |       CAST(CASE WHEN coalesce(s.mc, -1.0) >= $TauCont THEN 1
      |         ELSE 0 END AS BIGINT) AS contaminated
      |FROM a LEFT JOIN sims s ON a.vec_id = s.vec_id
      |WHERE a.vec_id % 20 <> 0
      |ORDER BY a.vec_id""".stripMargin

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(
      ("weighted_sample", weightedSample _, Some(weightedSampleSql)),
      ("stream_weighted_sample", streamWeightedSample _,
        Some(weightedSampleSql)),
      ("lm_train_bigram", lmTrainBigram _, Some(lmTrainBigramSql)),
      ("stream_lm_bigram", streamLmBigram _, Some(lmTrainBigramSql)),
      ("lm_bigram_perplexity", lmBigramPerplexity _,
        Some(lmBigramPerplexitySql)),
      ("tokenizer_fertility", tokenizerFertility _,
        Some(tokenizerFertilitySql)),
      ("emb_decontaminate", embDecontaminate _, Some(embDecontaminateSql)))
}
