package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The salted join must actually shuffle on (key, salt) — a broadcast
  * strategy would make the salt a silent no-op. */
class SkewSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("skew-spec")
    .getOrCreate()

  test("salted join shuffles on (key, salt), not broadcast") {
    val df = SkewQueries.skewSaltedJoin(spark, "/root/testdata/sf0.001")
    val text = df.queryExecution.executedPlan.toString
    assert(!text.contains("BroadcastHashJoin"),
      s"salted join must not broadcast:\n$text")
    assert(text.contains("_salt"),
      s"join keys must include the salt:\n$text")
  }
}
