package graft.mwas

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P8/P10: the intake policy stage the reference runs before processing —
  * skip empty metadata (1-byte sentinel files), skip projects over the
  * size budget, skip the hand-maintained blacklist
  * (main/converter_.py:11-31, main/mwas_general.py:295-314).
  *
  * Faithful quirk kept on purpose: the reference writes `too_large` to
  * blacklist.txt for BOTH oversized and blacklisted projects (one `else`
  * covers both, main/mwas_general.py:308-310) — `status` reproduces that
  * conflation; the separate `in_blacklist` column preserves the
  * distinction the reference's log loses.
  *
  * Shape at scale: one broadcast join (the blacklist is tiny by
  * construction) over an already-aggregated per-project stats relation —
  * no shuffle of the underlying data at all.
  */
object Policy {

  /** @param stats     one row per project: (bioproject, size_bytes, …) —
    *                  extra columns pass through
    * @param blacklist single-column (bioproject) relation
    * @param maxSize   size budget as a Column (a literal, or a derived
    *                  scalar such as a window average) */
  def route(stats: DataFrame, blacklist: DataFrame, maxSize: Column)
      : DataFrame = {
    val bl = blacklist.select(col("bioproject"))
      .distinct().withColumn("in_blacklist", lit(true))
    stats
      .join(broadcast(bl), Seq("bioproject"), "left_outer")
      .na.fill(Map("in_blacklist" -> false))
      .withColumn("status",
        when(col("size_bytes") <= 1, "was_empty")
          .when(col("size_bytes") <= maxSize && !col("in_blacklist"),
            "accepted")
          .otherwise("too_large"))
  }

  /** The accepted slice — what feeds the pipeline. */
  def accepted(routed: DataFrame): DataFrame =
    routed.filter(col("status") === "accepted")
}
