package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Incremental connected components — near-dup clustering maintained as
  * documents arrive, the missing INCREMENTAL form of the
  * pairs-to-survivors contraction ([[DedupQueries.dedupComponents]]).
  *
  * Two-part state, both roles already proven separately and composed
  * here into a NEW class:
  *
  *   1. Pair discovery is accumulate-and-probe (the
  *      [[StreamingDedupQueries]] discipline) on the exact word store:
  *      each trigger finds the J ≥ 0.7 pairs touching ITS docs against
  *      everything seen so far ([[DedupQueries.jaccardPairsStore]] —
  *      same join, same prefilter, same threshold as the batch pair
  *      relation, so per-trigger discovery is exactly the new-edge
  *      subset). Honest cost statement: the probe's OUTPUT and its
  *      word-collision term are ∝ batch, but each trigger re-scans and
  *      re-shuffles the accumulated store (and re-derives the per-doc
  *      count relation from it) — one O(history) pass per trigger,
  *      measured flat ~15 s/trigger across a 3×-growing store at the
  *      10× fixture. At production scale that pass is the store
  *      staying cluster-cached between triggers, and the banded
  *      candidate swap (the batch arm's documented 100 TB path)
  *      replaces the word join entirely.
  *   2. The component structure is carried as the CONTRACTED MAPPING —
  *      the converged (node → component-min) star relation, |V| rows —
  *      not the accumulated edge list. Each trigger re-contracts
  *      (mapping ∪ new pairs) through the SAME
  *      [[DedupQueries.connectedComponents]] star rounds. This is
  *      exact: the mapping is a spanning star of each component, so it
  *      preserves the accumulated graph's connectivity and adds none —
  *      CC(contract(G) ∪ E') = CC(G ∪ E'), the contraction-homomorphism
  *      identity. Union-find as a relational fixpoint, with state that
  *      never exceeds one row per non-singleton vertex.
  *
  * The readout replays the batch tail (universe left-join, singletons
  * self-mapped), so the stream hash-oracles against the literally-same
  * SQL as `dedup_components`. At 100 TB the probe store swaps for the
  * banded candidate relation exactly as the batch arm's scaladoc
  * documents — the mapping state and contraction are unchanged.
  *
  * Determinism: staged single-file batches, `maxFilesPerTrigger=1`,
  * `Trigger.AvailableNow`; generation-suffixed mapping dirs (the
  * [[graft.streaming.StreamingScd2]] compacted-store pattern). */
object StreamingComponentsQueries {

  def streamComponents(s: SparkSession, dir: String): DataFrame = {
    val d = DedupQueries.docs(s, dir)
      .select(col("doc_id"), col("source"), col("text"))
    val (idMin, idMax) = graft.streaming.StreamingQueries.idRange(d, "doc_id")
      .getOrElse(throw new IllegalArgumentException(
        "empty input relation: nothing to stream"))
    val b1 = idMin + (idMax - idMin) / 3
    val b2 = idMin + 2 * (idMax - idMin) / 3
    val staging = graft.streaming.StreamingQueries.stageBatches(
      "graft_stream_cc_stage_" + graft.streaming.StreamingQueries.pathTag(dir),
      Seq(d.filter(col("doc_id") <= b1),
        d.filter(col("doc_id") > b1 && col("doc_id") <= b2),
        d.filter(col("doc_id") > b2)))

    val base = graft.streaming.StreamingQueries.stateBase(
      "graft_stream_cc", dir)
    val wordsDir = s"$base/words"
    @volatile var mappingPath: Option[String] = None

    val src = s.readStream.schema(d.schema)
      .option("maxFilesPerTrigger", "1").parquet(staging.toString)
    val q = src.writeStream.foreachBatch { (batch: DataFrame, bid: Long) =>
      val ss = batch.sparkSession
      // words append FIRST so the probe store includes this batch's own
      // docs (new–new pairs discover in the same trigger as new–old);
      // the batch's word relation probes directly — it is already in
      // hand, and a store semi-join would rescan the full store
      val bw = DedupQueries.wordRelOf(batch).localCheckpoint(true)
      bw.write.mode("append").parquet(wordsDir)
      // EXPLICIT-width repartition on the join key (the store arrives
      // as one single-file append per trigger — the single-task
      // lesson); the BROADCAST trap this pairs with lives inside
      // jaccardPairsStore's shuffle_merge pin, where it is documented
      val store = ss.read.parquet(wordsDir)
        .repartition(ss.sparkContext.defaultParallelism,
          col("source"), col("word"))
      val newPairs = DedupQueries.jaccardPairsStore(store, bw)
      val prev = mappingPath match {
        case Some(p) => ss.read.parquet(p)
        case None => ss.createDataFrame(
          ss.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL("u LONG, v LONG"))
      }
      val next = DedupQueries.connectedComponents(prev.unionByName(newPairs))
      val nextPath = s"$base/mapping_g$bid"
      next.write.mode("overwrite").parquet(nextPath)
      mappingPath = Some(nextPath)
      ()
    }.trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // the batch query's tail over the final mapping — same SQL oracle
    val comp = s.read.parquet(mappingPath.get)
      .select(col("u").as("doc_id"), col("v").as("component"))
    d.select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left_outer")
      .withColumn("component", coalesce(col("component"), col("doc_id")))
      .withColumn("keep", col("doc_id") === col("component"))
      .orderBy(col("doc_id"))
  }

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(("stream_components", streamComponents _,
      Some(DedupQueries.dedupComponentsSql)))
}
