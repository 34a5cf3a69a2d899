package graft.core

import org.apache.spark.sql.SparkSession

/** Deployment profile: turns cluster geometry + input size into the
  * session conf the engine's scale story assumes (VERDICT r10 item 6 —
  * "tuned for local[32]" must be a PROFILE, not a hard-coded habit, or
  * the 100 TB claim is only argued, never runnable).
  *
  * Every derivation here is the standard public Spark sizing arithmetic:
  *
  *   - '''Shuffle width from input stats, not a constant.''' The
  *     AQE-era recipe: seed `coalescePartitions.initialPartitionNum`
  *     with input-bytes / target-partition-bytes (so no post-shuffle
  *     partition is built above the spill threshold even BEFORE runtime
  *     stats arrive), set `shuffle.partitions` to the same value as the
  *     non-AQE fallback, and let AQE coalesce downward using real map
  *     output sizes. A floor of 2× total cores keeps small inputs from
  *     under-parallelizing the cluster.
  *   - '''Scan granularity.''' `files.maxPartitionBytes` = the same
  *     target so scan tasks and shuffle partitions budget memory the
  *     same way.
  *   - '''Broadcast threshold from executor memory.''' A broadcast copy
  *     lands on every executor and is built on the driver: 64 MiB is
  *     safe from ~8 GiB executors upward (Spark's 10 MiB default is
  *     sized for much smaller containers); below that stay at 32 MiB.
  *     The engine's dimension relations (catalog, sets, vocab, codebook)
  *     are all far below either bound — raising the threshold is what
  *     keeps them broadcast at 100 TB fact-side scale.
  *   - '''AQE on, with skew-join.''' Runtime re-plan + skew splitting is
  *     the documented answer for the skewed keys the policy/salting
  *     operators don't already handle (SkewQueries covers the explicit
  *     path; AQE covers the residual).
  *
  * Nothing here is graft-specific magic: the object just centralizes the
  * arithmetic so a deployment states its geometry once. The local[32]
  * test profile and the bench harness use [[ClusterProfile.local]]; a
  * 1000-executor 100 TB deployment states
  * `ClusterProfile(executors = 1000, coresPerExecutor = 8,
  * executorMemGb = 32, inputBytes = 100L << 40)` and gets defensible
  * knobs instead of defaults sized for a laptop.
  */
final case class ClusterProfile(
    executors: Int,
    coresPerExecutor: Int,
    executorMemGb: Int,
    inputBytes: Long,
    targetPartitionBytes: Long = 128L << 20) {
  require(executors > 0 && coresPerExecutor > 0 && executorMemGb > 0 &&
    inputBytes >= 0 && targetPartitionBytes > 0,
    s"degenerate profile: $this")

  def totalCores: Int = executors * coresPerExecutor

  /** Bytes-derived shuffle width with a 2×cores parallelism floor. */
  def shufflePartitions: Int = {
    val fromBytes = (inputBytes + targetPartitionBytes - 1) /
      targetPartitionBytes
    math.max(2L * totalCores, fromBytes)
      .min(Int.MaxValue.toLong).toInt
  }

  /** 64 MiB from 8 GiB executors upward, 32 MiB below — see class doc. */
  def broadcastThresholdBytes: Long =
    if (executorMemGb >= 8) 64L << 20 else 32L << 20

  /** Streaming state-store width. A streaming query's shuffle width is
    * FROZEN into its checkpoint at the stream's first run (Spark pins
    * the state-store partition count for the stream's lifetime — the
    * documented reason sql.shuffle.partitions must be set before, not
    * after, starting a stateful stream). It is therefore sized for
    * STATE volume and scheduling stability, not for per-batch input
    * bytes: the batch-oriented bytes-derived width (819200 at 100 TB)
    * would mean 819200 state files per operator REBUILT per
    * micro-batch, almost all of them bytes-sized. 2×cores keeps every
    * core busy during state maintenance; the 4096 cap keeps state files
    * from shrinking into per-file metadata noise on long-running
    * streams. Structured Streaming has no AQE, so this width is real —
    * exactly why it gets its own derivation. */
  def streamStatePartitions: Int = math.min(2 * totalCores, 4096)

  /** The knob set, as data — one source of truth for [[applyTo]], specs,
    * and operators that need to reason about the profile. */
  def confs: Map[String, String] = Map(
    "spark.sql.shuffle.partitions" -> shufflePartitions.toString,
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum" ->
      shufflePartitions.toString,
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
      (targetPartitionBytes / 2).toString,
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.files.maxPartitionBytes" -> targetPartitionBytes.toString,
    "spark.sql.autoBroadcastJoinThreshold" ->
      broadcastThresholdBytes.toString,
    // Cached plans must get AQE coalescing too: with the default
    // (false), a persisted DataFrame's exchanges run at the FULL seed
    // width — at this profile's 819200 that is 819200 real reduce
    // tasks per cached exchange (caught live by the r13 full-surface
    // profiled Verify: the persisted MWAS pipeline sat in a
    // 156k-tasks-deep stage). The trade the flag makes — a cached
    // plan's output partitioning may change between materializations —
    // is exactly what a bytes-seeded + AQE geometry wants.
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning" -> "true",
    // consumed by the engine's stateful-stream runners (see
    // StreamingQueries.runAvailableNow), not by Spark itself
    "spark.graft.stream.statePartitions" ->
      streamStatePartitions.toString)

  /** Lands every runtime-settable knob in the live session conf.
    * (`files.maxPartitionBytes` and the AQE flags are runtime-settable;
    * static confs like executor memory belong to spark-submit, which is
    * where the geometry fields themselves come from.) */
  def applyTo(s: SparkSession): Unit =
    confs.foreach { case (k, v) => s.conf.set(k, v) }
}

object ClusterProfile {
  /** The CI/bench geometry: one 32-thread local JVM over the ≤ sf0.1
    * fixtures. The byte term is ~0 at fixture scale, so the 2×cores
    * floor IS the width (64). The bench/Verify harnesses keep their
    * hand-pinned 32 instead — their medians are compared against an
    * append-only history and re-balancing partitions mid-series would
    * break comparability, which is a measurement constraint, not a
    * sizing one. Handed 100 TB, the SAME arithmetic widens to ~819k
    * initial partitions and AQE coalesces from there. */
  val local: ClusterProfile = ClusterProfile(
    executors = 1, coresPerExecutor = 32, executorMemGb = 128,
    inputBytes = 0L)

  /** The class doc's 100 TB deployment, as a named artifact: 1000
    * executors × 8 cores × 32 GiB over 100 TB of input. The derived
    * width is ~819k initial partitions (bytes term dominates) with AQE
    * coalescing from there. */
  val cluster100tb: ClusterProfile = ClusterProfile(
    executors = 1000, coresPerExecutor = 8, executorMemGb = 32,
    inputBytes = 100L << 40)

  /** Resolve a profile by name (the `SPARK_GRAFT_PROFILE` env contract —
    * see Bench): named presets, or `ExCxM@GB` geometry syntax, e.g.
    * `16x8x64@4096` = 16 executors × 8 cores × 64 GiB over 4096 GiB. */
  def named(name: String): ClusterProfile = name match {
    case "local"        => local
    case "cluster100tb" => cluster100tb
    case geom =>
      // a typo must surface the syntax contract, not a bare
      // NumberFormatException from a 4-token near-miss like "8x4x16@4g"
      geom.split("[x@]") match {
        case Array(e, c, m, gb) if Seq(e, c, m, gb).forall(t =>
            t.nonEmpty && t.length <= 9 && t.forall(_.isDigit)) =>
          ClusterProfile(e.toInt, c.toInt, m.toInt, gb.toLong << 30)
        case _ => sys.error(
          s"unknown profile '$geom' (local | cluster100tb | ExCxM@GB)")
      }
  }
}
