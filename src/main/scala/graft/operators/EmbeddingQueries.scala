package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Embedding-column transforms a training pipeline runs BEFORE the
  * similarity/dedup stages: dimensionality reduction and storage
  * quantization. Both are deterministic functions of (corpus, pinned
  * constants), so both get the full cross-engine hash oracle — the same
  * posture `ann_lsh_bucket` takes (pinned planes turn "approximate" into
  * "exact given the model").
  *
  * Scale notes:
  *   - projection: per-row only — K native dot products against broadcast
  *     literal vectors inside one WholeStageCodegen span; zero shuffles
  *     except the presentation orderBy. At 100 TB this is a map-only pass.
  *   - quantization: the per-dimension min/max "model fit" aggregates
  *     D = 64 rows (algebraic MIN/MAX, map-side combined); codes join back
  *     against that broadcast relation (no shuffle), and only the
  *     signature re-assembly groups by vec_id. At real scale the
  *     re-assembly shuffle disappears: keep the codes as a per-row array
  *     computed against the broadcast bounds instead of exploding —
  *     documented here, measured unnecessary at test SFs where the
  *     explode path keeps every expression codegen'd.
  */
object EmbeddingQueries {

  private val D = 64 // embedding width of the `embeddings` table
  private val K = 8  // projected width

  private def vecs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))

  // ----------------------------------- E1: sparse random projection (JL)

  /** Achlioptas sparse projection signs in {-1, 0, +1} (density 1/3),
    * derived from a pure int64 LCG so the Spark plan and the generated
    * DuckDB oracle share literally the same matrix without a float RNG. */
  private[operators] def rpSign(k: Int, d: Int): Double = {
    val m = (1103515245L * (k * D + d) + 12345L) % 2147483648L
    (m % 6) match {
      case 0 => 1.0
      case 1 => -1.0
      case _ => 0.0
    }
  }

  private[operators] val rpScale: Double = math.sqrt(3.0 / K)

  /** Johnson–Lindenstrauss reduction 64 → 8 dims: p_k = sqrt(3/K) · v·r_k
    * with the pinned sparse sign matrix. Downstream ANN/clustering run on
    * an 8× narrower column at ~unchanged pairwise geometry (JL lemma);
    * this query materializes the projected columns themselves. */
  def embProjectRp(s: SparkSession, dir: String): DataFrame = {
    val projected = (0 until K).map { k =>
      val r = typedLit((0 until D).map(d => rpSign(k, d)))
      round(graft.functions.VectorOps.dot_product(col("v"), r) * rpScale, 6)
        .as(s"p$k")
    }
    vecs(s, dir)
      .select(col("vec_id") +: col("label") +: projected: _*)
      .orderBy(col("vec_id"))
  }

  /** Generated oracle: the sign matrix and the scale constant are rendered
    * from the same Scala definitions the plan compiles in (shortest
    * round-trip doubles parse back bit-identical — the `annLshBucketSql`
    * convention). */
  val embProjectRpSql: String = {
    val cols = (0 until K).map { k =>
      val lits = (0 until D).map(d => rpSign(k, d)).mkString(", ")
      s"  round(list_sum(list_transform(list_zip(embedding::DOUBLE[], " +
        s"[$lits]::DOUBLE[]), s -> s[1] * s[2])) * $rpScale, 6) AS p$k"
    }
    s"""SELECT vec_id, label,
       |${cols.mkString(",\n")}
       |FROM embeddings ORDER BY vec_id""".stripMargin
  }

  // ------------------------------------- E2: int8 scalar quantization

  /** Global per-dimension min/max scalar quantization to uint8 codes —
    * the standard 4× embedding-storage compressor. Codes are
    * floor((x − mn_d) · 255 / (mx_d − mn_d)) clamped to 255 (floor, not
    * round: unambiguous half-way semantics cross-engine). The code string
    * goes out '; '-joined (house array rule); the saturation count is the
    * quality probe (a clipped dimension means the corpus outgrew the
    * bounds). Constant dimension (mx = mn) → code 0. */
  def embQuantizeInt8(s: SparkSession, dir: String): DataFrame = {
    val e = vecs(s, dir)
      .select(col("vec_id"), posexplode(col("v")).as(Seq("pos", "x")))
    val bounds = e.groupBy(col("pos"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val coded = e.join(broadcast(bounds), Seq("pos"))
      .withColumn("code",
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(
            floor((col("x") - col("mn")) * 255.0 / (col("mx") - col("mn"))),
            lit(255.0)).cast("long")))
    coded.groupBy(col("vec_id"))
      .agg(
        // |D|-sized arrays post-aggregate — the interpreted transform runs
        // on one row per vector, not per element (annLshBucket precedent)
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("code")))),
          t => t.getField("code").cast("string")), "; ").as("codes"),
        min(col("code")).as("code_min"),
        max(col("code")).as("code_max"),
        sum(when(col("code") === 255L, 1L).otherwise(0L)).as("n_saturated"))
      .orderBy(col("vec_id"))
  }

  val embQuantizeInt8Sql: String =
    """WITH e AS (
      |  SELECT vec_id,
      |         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
      |         CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings),
      |b AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM e GROUP BY pos),
      |c AS (
      |  SELECT vec_id, pos,
      |    CASE WHEN mx = mn THEN 0
      |         ELSE CAST(least(floor((x - mn) * 255.0 / (mx - mn)), 255.0)
      |                AS BIGINT) END AS code
      |  FROM e JOIN b USING (pos))
      |SELECT vec_id,
      |  array_to_string(list(code::VARCHAR ORDER BY pos), '; ') AS codes,
      |  CAST(min(code) AS BIGINT) AS code_min,
      |  CAST(max(code) AS BIGINT) AS code_max,
      |  CAST(sum(CASE WHEN code = 255 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_saturated
      |FROM c GROUP BY vec_id ORDER BY vec_id""".stripMargin

  // --------------------------------------- E3: dimension health statistics

  /** Per-dimension embedding health — the diagnostic run before any
    * similarity work ships: mean/sd (dead or near-constant dimensions
    * contribute nothing but storage), min/max (scale imbalance that
    * wrecks unnormalized distances). One algebraic pass: everything
    * derives from (Σx, Σx², min, max, n) per dimension, so the plan is
    * a single map-side-combined aggregate over the posexploded relation
    * — no second pass, no window. The sd is the manual population form
    * √(Σx²/n − mean²) (the `anomaly_zscore` convention: both engines
    * compute the same formula rather than trusting two different
    * builtin stddev implementations). */
  def embDimStats(s: SparkSession, dir: String): DataFrame = {
    val e = vecs(s, dir)
      .select(posexplode(col("v")).as(Seq("pos", "x")))
    val mean = col("sx") / col("n")
    // greatest(…, 0): FP residual can land the variance of a CONSTANT
    // dimension a hair negative (NaN sqrt) — and on opposite signs in
    // the two engines. The house clamp convention (IvfQueries,
    // MwasPipelineQueries), applied to exactly the dead-dim case this
    // query exists to flag.
    val sd = sqrt(greatest(col("sxx") / col("n") - mean * mean, lit(0.0)))
    e.groupBy(col("pos"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"),
        min(col("x")).as("mn"), max(col("x")).as("mx"))
      .select(col("pos").cast("long").as("pos"),
        round(mean, 6).as("mean"),
        round(sd, 6).as("sd"),
        col("mn"), col("mx"),
        (sd < 1e-6).as("dead"))
      .orderBy(col("pos"))
  }

  val embDimStatsSql: String =
    """WITH e AS (
      |  SELECT CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT)
      |           AS pos,
      |         CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings),
      |a AS (
      |  SELECT pos, count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx,
      |         min(x) AS mn, max(x) AS mx
      |  FROM e GROUP BY pos),
      |m AS (
      |  SELECT pos, sx / n AS mean0,
      |    sqrt(greatest(sxx / n - (sx / n) * (sx / n), 0)) AS sd0,
      |    mn, mx
      |  FROM a)
      |SELECT pos, round(mean0, 6) AS mean, round(sd0, 6) AS sd,
      |  mn, mx, sd0 < 1e-6 AS dead
      |FROM m ORDER BY pos""".stripMargin

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(
      ("emb_project_rp", embProjectRp _, Some(embProjectRpSql)),
      ("emb_quantize_int8", embQuantizeInt8 _, Some(embQuantizeInt8Sql)),
      ("emb_dim_stats", embDimStats _, Some(embDimStatsSql)))
}
