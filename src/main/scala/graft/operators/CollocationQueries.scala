package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Collocation mining: pointwise mutual information over adjacent token
  * pairs — the classic corpus-analysis primitive behind phrase detection
  * (word2vec's phrase pass, Mikolov et al. 2013) and the tokenizer-
  * vocabulary merges a training-data pipeline runs before BPE fitting.
  *
  * PMI(x,y) = ln( p(x,y) / (p(x)·p(y)) ) with p(x,y) over the bigram
  * space and p(x) over the unigram space; computed as ONE literal
  * expression `ln((c_xy·N_uni·N_uni)::double / (N_bi·c_x·c_y))` so both
  * engines evaluate the identical double (the integer numerator/
  * denominator are exact in both; at real corpus scale the product form
  * switches to log subtraction — the fixture-exact form is what
  * hash-oracles).
  *
  * Plan shape: bigrams derive from posexplode + an equi-join on
  * (doc_id, pos+1) — all codegen'd, no interpreted higher-order
  * functions in the per-token path (house rule; a `transform`-lambda
  * variant would run interpreted per document). Unigram and bigram
  * counts are map-side-combined aggregations; the two unigram attach
  * joins broadcast the vocabulary-sized count relation (bounded by
  * |vocab|, not corpus size); top-k plans as TakeOrderedAndProject.
  * The min-count floor (c_xy ≥ 5) is standard: PMI of rare pairs is
  * noise — and it also bounds the output long before the ranking.
  */
object CollocationQueries {

  private val minCount = 5
  private val topK = 40

  /** (doc_id, pos, tok) token-instance relation — the shared grain for
    * bigram derivation here and in [[textLmScore]]. */
  private def tokenInstances(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .filter(length(col("tok")) > 0)

  /** Adjacent-pair instances (doc_id, x, y) via the codegen'd
    * (doc_id, pos+1) self-join — see the object doc for why not a
    * per-document lambda. */
  private def bigramInstances(w: DataFrame): DataFrame =
    w.select(col("doc_id"), col("pos"), col("tok").as("x"))
      .join(w.select(col("doc_id"), (col("pos") - 1).as("pos"),
        col("tok").as("y")), Seq("doc_id", "pos"))

  def tokenPmi(s: SparkSession, dir: String): DataFrame = {
    val w = tokenInstances(s, dir)
    val uni = w.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val nUni = uni.agg(sum(col("c")).as("n_uni"))
    val bi = bigramInstances(w)
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
    val nBi = bi.agg(sum(col("c_xy")).as("n_bi"))
    bi
      .join(broadcast(uni.select(col("tok").as("x"), col("c").as("c_x"))),
        Seq("x"))
      .join(broadcast(uni.select(col("tok").as("y"), col("c").as("c_y"))),
        Seq("y"))
      .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBi))
      .select(col("x"), col("y"), col("c_xy"),
        round(log((col("c_xy") * col("n_uni") * col("n_uni")).cast("double")
          / (col("n_bi") * col("c_x") * col("c_y")).cast("double")), 6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("x"), col("y"))
      .limit(topK)
  }

  val tokenPmiSql: String = {
    // N_bi counts only floor-surviving bigrams on BOTH sides — the floor
    // is applied before the scalar, so the two engines see the same space
    s"""WITH w AS (
       |  SELECT doc_id,
       |         CAST(generate_subscripts(string_split(text, ' '), 1) - 1
       |           AS BIGINT) AS pos,
       |         unnest(string_split(text, ' ')) AS tok
       |  FROM documents),
       |wf AS (SELECT * FROM w WHERE len(tok) > 0),
       |uni AS (SELECT tok, count(*) AS c FROM wf GROUP BY tok),
       |bi AS (SELECT a.tok AS x, b.tok AS y, count(*) AS c_xy
       |       FROM wf a JOIN wf b
       |         ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       |       GROUP BY 1, 2 HAVING count(*) >= $minCount)
       |SELECT bi.x, bi.y, bi.c_xy,
       |       round(ln(CAST(bi.c_xy * n.n_uni * n.n_uni AS DOUBLE)
       |         / CAST(m.n_bi * ux.c * uy.c AS DOUBLE)), 6) AS pmi
       |FROM bi
       |JOIN uni ux ON ux.tok = bi.x
       |JOIN uni uy ON uy.tok = bi.y
       |CROSS JOIN (SELECT sum(c) AS n_uni FROM uni) n
       |CROSS JOIN (SELECT sum(c_xy) AS n_bi FROM bi) m
       |ORDER BY pmi DESC, x, y LIMIT $topK""".stripMargin
  }

  /** Corpus-LM document scoring — the CCNet/Gopher-class quality filter:
    * score every document by its average bigram log-likelihood under a
    * language model (here the corpus's own add-one-smoothed bigram MLE:
    * P(y|x) = (c_xy + 1) / (c_x· + V), with c_x· the left-context count
    * and V the vocabulary size; production scores against a CLEAN
    * reference LM — KenLM in CCNet — but the estimator, the join shape,
    * and the perplexity arithmetic are identical, and self-scoring keeps
    * the operator fully corpus-derived and hash-oracle-able).
    *
    * High perplexity = the document's word transitions are unlike the
    * corpus — boilerplate, wrong language, mangled extraction; it is the
    * standard curation signal next to the heuristic quality score
    * (`text_quality`).
    *
    * Plan shape: the model is a vocab²-bounded count relation (broadcast
    * to the scoring join — at web scale still ≤ millions of surviving
    * bigrams, pruned by min-count); scoring is one map-side join over
    * bigram instances plus a per-doc aggregate. The per-doc float sum of
    * K log terms follows the house K-term-reduction precedent
    * (text_dist_drift): round(·,6), driftaudit-guarded. */
  def textLmScore(s: SparkSession, dir: String): DataFrame = {
    val w = tokenInstances(s, dir)
    val inst = bigramInstances(w)
    val cxy = inst.groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("c_xy"))
    val cx = inst.groupBy(col("x")).agg(count(lit(1)).as("c_x"))
    val vocab = w.agg(countDistinct(col("tok")).as("v"))
    val model = cxy.join(broadcast(cx), Seq("x"))
      .crossJoin(broadcast(vocab))
      .select(col("x"), col("y"),
        log((col("c_xy") + lit(1.0)) / (col("c_x") + col("v"))).as("lp"))
    inst.join(broadcast(model), Seq("x", "y"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("slp"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("slp") / col("n_bigrams"), 6).as("avg_logp"),
        round(exp(-col("slp") / col("n_bigrams")), 6).as("ppl"))
      .orderBy(col("doc_id"))
  }

  val textLmScoreSql: String =
    """WITH w AS (
      |  SELECT doc_id,
      |         CAST(generate_subscripts(string_split(text, ' '), 1) - 1
      |           AS BIGINT) AS pos,
      |         unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |wf AS (SELECT * FROM w WHERE len(tok) > 0),
      |inst AS (SELECT a.doc_id, a.tok AS x, b.tok AS y
      |         FROM wf a JOIN wf b
      |           ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
      |cxy AS (SELECT x, y, count(*) AS c_xy FROM inst GROUP BY 1, 2),
      |cx AS (SELECT x, count(*) AS c_x FROM inst GROUP BY 1),
      |v AS (SELECT count(DISTINCT tok) AS v FROM wf),
      |model AS (
      |  SELECT cxy.x, cxy.y,
      |         ln((cxy.c_xy + 1.0) / (cx.c_x + v.v)) AS lp
      |  FROM cxy JOIN cx ON cxy.x = cx.x CROSS JOIN v)
      |SELECT i.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |       round(sum(m.lp) / count(*), 6) AS avg_logp,
      |       round(exp(-sum(m.lp) / count(*)), 6) AS ppl
      |FROM inst i JOIN model m ON i.x = m.x AND i.y = m.y
      |GROUP BY i.doc_id ORDER BY i.doc_id""".stripMargin

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(
      ("token_pmi", tokenPmi _, Some(tokenPmiSql)),
      ("text_lm_score", textLmScore _, Some(textLmScoreSql)))
}
