package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall gate for the approximate-NN operators: joins an approximate
  * per-vector NN relation against the exact chunked-sweep relation and
  * reduces to ONE summary row. Replaces a bare rows>0 check with a
  * number that means something — AnnRecallSpec thresholds it, the driver
  * rows-checks it, and at 100 TB the same query is the production
  * recall monitor (one narrow join + one global aggregate).
  */
object AnnRecall {

  /** @param approx (vec_id, n_candidates, nn_id NULLABLE, cosine) — a
    *               vector with no bucket-mates has a null nn_id and
    *               counts as a miss
    * @param exact  (vec_id, nn_id, cos) from the exact sweep
    */
  def summarize(approx: DataFrame, exact: DataFrame): DataFrame = {
    val e = exact.select(col("vec_id"), col("nn_id").as("exact_nn_id"),
      col("cos").as("exact_cos"))
    // a hit is the exact neighbor id OR any neighbor whose cosine ROUNDED
    // TO 6 DECIMALS equals the rounded exact cosine (the approx side only
    // carries round(cos, 6); the 1e-9 slack below is pure FP guard on the
    // equality, not a wider tolerance). So a genuinely different neighbor
    // that agrees with the optimum at 6-decimal resolution also counts —
    // for a recall GATE that is the right trade (such a neighbor is an
    // interchangeable answer for dedup/search), but the reported
    // recall_at_1 can exceed strict id-match recall by the measure of
    // 6-dp cosine ties in the corpus.
    val hit = col("nn_id") === col("exact_nn_id") ||
      abs(col("cosine") - round(col("exact_cos"), 6)) < 1e-9
    approx.join(e, Seq("vec_id"))
      .agg(
        count(lit(1)).as("n_vectors"),
        sum(when(col("n_candidates") > 0, 1L).otherwise(0L))
          .as("n_with_candidates"),
        round(avg(when(hit, 1.0).otherwise(0.0)), 6).as("recall_at_1"),
        round(avg(col("exact_cos")), 6).as("mean_exact_cos"),
        round(avg(coalesce(col("cosine"), lit(0.0))), 6)
          .as("mean_found_cos"))
  }
}
