package graft.core

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The profile's knobs must actually LAND in a live session conf, and
  * the sizing arithmetic must hold at the geometries the scale story
  * cites (VERDICT r10 item 6). */
class ClusterProfileSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("cluster-profile-spec")
    .getOrCreate()

  test("applyTo lands every knob in the live session conf") {
    val p = ClusterProfile(executors = 10, coresPerExecutor = 4,
      executorMemGb = 16, inputBytes = 1L << 40) // 1 TiB
    // getOrCreate may hand back a session shared with other suites, so
    // snapshot and restore every knob applyTo touches — leaking an 8192
    // shuffle width into later suites turns their tests into
    // 8192-task crawls (observed: a full-suite run went from ~4 to
    // >15 min before this restore existed).
    val prior = p.confs.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      p.applyTo(spark)
      p.confs.foreach { case (k, v) =>
        assert(spark.conf.get(k) == v, s"knob $k did not land")
      }
      // and the session is really using them: a fresh plan picks up the
      // new shuffle width
      assert(spark.conf.get("spark.sql.shuffle.partitions") ==
        p.shufflePartitions.toString)
    } finally {
      prior.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("shuffle width follows input bytes with a 2x-cores floor") {
    val small = ClusterProfile(executors = 10, coresPerExecutor = 4,
      executorMemGb = 16, inputBytes = 0L)
    assert(small.shufflePartitions == 80) // floor: 2 x 40 cores

    // 1 TiB / 128 MiB = 8192 partitions > floor
    val big = small.copy(inputBytes = 1L << 40)
    assert(big.shufflePartitions == 8192)

    // the cited 100 TB / 1000-executor geometry: ~819k initial
    // partitions, AQE coalesces from there
    val cluster = ClusterProfile(executors = 1000, coresPerExecutor = 8,
      executorMemGb = 32, inputBytes = 100L << 40)
    assert(cluster.shufflePartitions == 819200)
    assert(cluster.confs(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum") ==
      "819200")
  }

  test("stream state width is state-sized, never the batch width") {
    // 2×cores below the cap; capped at 4096 at cluster scale — the
    // batch-analytics 819200 must never reach a state store (the width
    // freezes into the checkpoint at first run and streaming has no AQE)
    assert(ClusterProfile(1, 32, 128, 0L).streamStatePartitions == 64)
    val c = ClusterProfile.named("cluster100tb")
    assert(c.streamStatePartitions == 4096)
    assert(c.confs("spark.graft.stream.statePartitions") == "4096")
    assert(c.streamStatePartitions < c.shufflePartitions)
  }

  test("broadcast threshold scales with executor memory") {
    val smallMem = ClusterProfile(1, 4, 4, 0L)
    val bigMem = ClusterProfile(1, 4, 32, 0L)
    assert(smallMem.broadcastThresholdBytes == (32L << 20))
    assert(bigMem.broadcastThresholdBytes == (64L << 20))
  }

  test("partition byte targets agree between scan and shuffle sides") {
    val p = ClusterProfile(4, 8, 16, 10L << 30)
    assert(p.confs("spark.sql.files.maxPartitionBytes") ==
      p.targetPartitionBytes.toString)
    assert(p.confs("spark.sql.adaptive.advisoryPartitionSizeInBytes") ==
      (p.targetPartitionBytes / 2).toString)
  }

  test("degenerate geometry is rejected") {
    intercept[IllegalArgumentException] {
      ClusterProfile(0, 8, 16, 0L)
    }
  }

  test("named profiles resolve, incl. the geometry syntax") {
    assert(ClusterProfile.named("local") == ClusterProfile.local)
    val c = ClusterProfile.named("cluster100tb")
    assert(c.totalCores == 8000)
    // 100 TB / 128 MiB = 819200 initial partitions — the bytes term
    // dominates the 2x-cores floor at this scale
    assert(c.shufflePartitions == 819200)
    val g = ClusterProfile.named("16x8x64@4096")
    assert(g == ClusterProfile(16, 8, 64, 4096L << 30))
    intercept[RuntimeException] { ClusterProfile.named("nonsense") }
  }
}
