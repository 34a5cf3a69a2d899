// lives in graft.operators.tools like the other dev probes; not part of
// the operator surface
package graft.operators.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Recorded NEGATIVE result (r9): positional prefix filtering for the
  * Jaccard pair join — tried, measured, and NOT shipped.
  *
  * The textbook candidate-pruning for threshold similarity joins
  * (Bayardo/Ma/Srikant WWW'07; Xiao et al. PPJoin WWW'08): under one
  * global rarest-first word order, a doc indexes only its first
  * `|d| − ⌈t·|d|⌉ + 1` words, any J ≥ t pair provably shares an indexed
  * word, and an exact verify pass runs on candidates only. The
  * [[prefixFiltered]] arm here implements it (integer-exact ⌈7n/10⌉ —
  * FP `ceil(0.7·n)` overshoots at n=20 and would drop true pairs);
  * `main` asserts result-set equality against the shipped exhaustive
  * formulation, then times both.
  *
  * Measured (medians, local[32]): sf0.001 1.60 vs 0.77 s; sf0.01 1.73
  * vs 1.04 s; sf0.1 6.53 vs 5.92 s; 5k docs × 1550-word vocab 3.34 vs
  * 2.45 s; 53k docs × 1550-word vocab **59.2 vs 7.5 s** — the prefix
  * arm LOSES everywhere on this workload class, catastrophically at
  * scale. Why: pruning power comes from hapax-dominated prefixes (rare
  * words with df ≈ 1, as in real text); on corpora whose rarest words
  * still have df in the hundreds, similar-length doc pairs nearly all
  * share a prefix word, so the candidate set barely shrinks and the
  * prefix path pays its ranking windows, candidate distinct, and
  * second verify join ON TOP of the same pair blowup. The shipped
  * operator keeps the single-pass inclusion–exclusion join with the
  * source-block bound as the documented scale lever; prefix filtering
  * remains the known upgrade path for hapax-rich corpora, behind this
  * probe's equality gate if it is ever revisited.
  */
object JaccardAb {
  /** The prefix-filtered formulation (not shipped — see above). */
  private def prefixFiltered(s: SparkSession, dir: String): DataFrame = {
    val w = graft.core.Tables(s, dir, "documents")
      .select(col("source"), col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("word"))
    val rank = w.groupBy(col("word")).agg(count(lit(1)).as("df"))
      .select(col("word"), row_number().over(
        Window.orderBy(col("df"), col("word"))).as("wrank"))
    val byDoc = Window.partitionBy(col("doc_id"))
    val pos = w.join(broadcast(rank), "word")
      .select(col("source"), col("doc_id"), col("word"),
        count(lit(1)).over(byDoc).as("nw"),
        row_number().over(byDoc.orderBy(col("wrank"))).as("pos"))
    val prefix = pos.filter(
      col("pos") <= expr("nw - (nw * 7 + 9) DIV 10 + 1"))
    val cands = prefix.select(col("source"), col("word"),
        col("doc_id").as("doc_a"), col("nw").as("na"))
      .join(prefix.select(col("source"), col("word"),
        col("doc_id").as("doc_b"), col("nw").as("nb")),
        Seq("source", "word"))
      .filter(col("doc_a") < col("doc_b") &&
        least(col("na"), col("nb")).cast("double") >=
          lit(0.7) * greatest(col("na"), col("nb")))
      .select(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      .distinct()
    val inter = cands
      .join(w.select(col("doc_id").as("doc_a"), col("word")), "doc_a")
      .join(w.select(col("doc_id").as("doc_b"), col("word")),
        Seq("doc_b", "word"))
      .groupBy(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
    inter
      .withColumn("jaccard", col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= 0.7)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shipped = graft.SparkEntry.queries("dedup_jaccard_pairs")(spark, dir)
      .collect().map(_.toSeq).toSet
    val pf = prefixFiltered(spark, dir).collect().map(_.toSeq).toSet
    require(shipped == pf,
      s"prefix-filtered != shipped: ${pf.size} vs ${shipped.size} pairs; " +
        s"only-prefix=${(pf -- shipped).take(3)} " +
        s"only-shipped=${(shipped -- pf).take(3)}")
    println(s"[jab] result sets identical: ${shipped.size} pairs @ $dir")

    val arms = Seq(
      "shipped" -> (() => graft.SparkEntry
        .queries("dedup_jaccard_pairs")(spark, dir)),
      "prefix " -> (() => prefixFiltered(spark, dir)))
    val times = collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to reps).foreach { _ =>
      arms.foreach { case (name, mk) =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        times(name) :+= (System.nanoTime() - t0) / 1e9
      }
    }
    arms.foreach { case (name, _) =>
      val ts = times(name)
      val med = ts.sorted.apply(ts.size / 2)
      println(f"[jab] $name median=$med%6.2f s  " +
        ts.map(t => f"$t%.2f").mkString("[", " ", "]"))
    }
    spark.stop()
  }
}
