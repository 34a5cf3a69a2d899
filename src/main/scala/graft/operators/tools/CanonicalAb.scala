// lives in graft.operators.tools to reach the package-private
// minhashPairs/connectedComponents; dev probe, not operator surface
package graft.operators.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{DedupQueries, TextQueries}

/** A/B for the `dedup_canonical` survivor-selection tail (r10).
  *
  * The shipped v1 used the r9 ANN argmax pattern — groupBy(component)
  * `max(struct(quality, -doc_id))` + join back. Its formatted plan
  * showed the WHOLE upstream (docs scan → quality explode/agg → comp
  * join) duplicated under both join branches: Catalyst does not reuse
  * common subplans, so the corpus is read and scored twice. The B arm
  * computes the same argmax as a window aggregate partitioned by
  * component (no ORDER BY — no value sort, just the partition
  * hash/sort), which keeps the upstream single-pass.
  *
  * This is NOT the r9 ANN case in reverse: there the argmax replaced a
  * row_number window whose per-partition ORDER BY paid a real sort and
  * the join-back side was a broadcast-small query set. Here the
  * join-back is the full corpus, so the duplicated upstream dominates.
  *
  * `main <sfDir> [reps]`: asserts both arms produce identical rows,
  * then times arms interleaved (control → A → B per rep) so host drift
  * hits all arms equally; prints per-arm medians.
  *
  * Measured (medians, local[32]): sf0.1 argmax 3.49 vs window 3.10 s
  * (control q6 0.41); 10× stress fixture argmax 8.12 vs window 6.87 s
  * over 7 reps (control dedup_exact 0.91). Window form SHIPPED as
  * `DedupQueries.dedupCanonical`; [[argmaxJoin]] is kept here as the
  * measured-and-rejected arm.
  */
object CanonicalAb {

  /** v1 (initial r10 form, NOT shipped): argmax + join-back. */
  private[tools] def argmaxJoin(s: SparkSession, dir: String): DataFrame = {
    val edges = DedupQueries.minhashPairs(s, dir)
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
    val comp = DedupQueries.connectedComponents(edges)
      .select(col("u").as("doc_id"), col("v").as("component"))
    val withComp = DedupQueries.docs(s, dir).select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left_outer")
      .withColumn("component", coalesce(col("component"), col("doc_id")))
      .join(TextQueries.qualityScore(s, dir), Seq("doc_id"))
    val survivor = withComp.groupBy(col("component"))
      .agg(max(struct(col("quality"), (-col("doc_id")).as("neg_id")))
        .as("best"))
      .select(col("component"), (-col("best.neg_id")).as("canonical_id"))
    withComp.join(survivor, Seq("component"))
      .select(col("doc_id"), col("component"), col("canonical_id"),
        col("quality"), (col("doc_id") === col("canonical_id")).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** v2 (SHIPPED): the window formulation — delegates to the live
    * operator so the A/B can never desynchronize from what ships. */
  private[tools] def windowMax(s: SparkSession, dir: String): DataFrame =
    DedupQueries.dedupCanonical(s, dir)

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    // equality gate first — a faster wrong answer is worthless
    val a = argmaxJoin(s, dir).collect().map(_.toString).sorted
    val b = windowMax(s, dir).collect().map(_.toString).sorted
    require(a.sameElements(b),
      s"arms disagree: ${a.length} vs ${b.length} rows, " +
        s"first diff ${a.zip(b).find { case (x, y) => x != y }}")
    println(s"[canonical-ab] equality gate passed (${a.length} rows)")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // control must live on the documents table — the stress fixture has
    // no TPC-H tables (q6 threw there)
    val arms = Seq(
      "control_dexact" -> (() => DedupQueries.dedupExact(s, dir)),
      "argmax_join" -> (() => argmaxJoin(s, dir)),
      "window_max" -> (() => windowMax(s, dir)))
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to reps).foreach { _ =>
      arms.foreach { case (name, mk) =>
        s.catalog.clearCache()
        val t = time(mk().write.format("noop").mode("overwrite").save())
        samples(name) = samples(name) :+ t
      }
    }
    def median(v: Vector[Double]) = v.sorted.apply((v.length - 1) / 2)
    arms.foreach { case (name, _) =>
      val v = samples(name)
      println(f"[canonical-ab] $name%-12s median ${median(v)}%.3f s  " +
        v.map(t => f"$t%.3f").mkString("[", ",", "]"))
    }
    s.stop()
  }
}
