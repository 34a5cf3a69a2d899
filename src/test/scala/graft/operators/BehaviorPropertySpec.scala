package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based checks of the event-sequence operators against
  * INDEPENDENT plain-Scala reimplementations over randomly generated
  * event sets — interval union and Markov transitions are exactly the
  * operators whose windowed gaps-and-islands / lead() formulations have
  * subtle edge cases (duplicate timestamps, single-event users,
  * back-to-back exact-touch intervals) that fixture data may never hit.
  */
class BehaviorPropertySpec extends Properties("BehaviorQueries") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("behavior-prop")
    .getOrCreate()

  private val span = 900000000L // 15 min in micros, the operator's span

  /** Events: (event_id, user, micros, type). Timestamps collide on
    * purpose (small range) to exercise tie handling. */
  private val genEvents: Gen[List[(Long, Long, Long, String)]] = for {
    n <- Gen.choose(1, 120)
    evs <- Gen.listOfN(n, for {
      u <- Gen.choose(0L, 5L)
      t <- Gen.choose(0L, 4L * span) // dense: forces overlaps AND gaps
      typ <- Gen.oneOf("view", "click", "purchase")
    } yield (u, t, typ))
  } yield evs.zipWithIndex.map { case ((u, t, typ), i) =>
    (i.toLong, u, t, typ)
  }

  private def toDf(evs: List[(Long, Long, Long, String)]) = {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    evs.toDF("event_id", "user_id", "us", "event_type")
      .withColumn("ts", timestamp_micros(col("us")))
      .withColumn("value", lit(1.0))
      .select("event_id", "ts", "user_id", "event_type", "value")
  }

  /** Plain-Scala interval union. */
  private def mergeRef(starts: Seq[Long]): (Long, Long, Long) = {
    val ivs = starts.sorted.map(st => (st, st + span))
    val merged = ivs.foldLeft(List.empty[(Long, Long)]) {
      case (acc, (st, en)) => acc match {
        case (ps, pe) :: tail if st <= pe =>
          (ps, math.max(pe, en)) :: tail
        case _ => (st, en) :: acc
      }
    }
    (merged.size.toLong,
      merged.map { case (a, b) => b - a }.sum,
      merged.map { case (a, b) => b - a }.max)
  }

  property("intervalMerge equals the plain-Scala union") =
    Prop.forAll(genEvents) { evs =>
      val got = BehaviorQueries.intervalMergeFrom(toDf(evs)).collect()
        .map(r => r.getAs[Long]("user_id") ->
          ((r.getAs[Long]("n_intervals"), r.getAs[Long]("covered_us"),
            r.getAs[Long]("max_span_us")), r.getAs[Long]("n_events")))
        .toMap
      val byUser = evs.groupBy(_._2)
      got.keySet == byUser.keySet && byUser.forall { case (u, rows) =>
        val (exp, (gotTriple, gotN)) = (mergeRef(rows.map(_._3)), got(u))
        gotTriple == exp && gotN == rows.size
      }
    }

  property("markovFrom equals plain-Scala consecutive pairs") =
    Prop.forAll(genEvents) { evs =>
      val ref = evs.groupBy(_._2).values.flatMap { rows =>
        val ordered = rows.sortBy(r => (r._3, r._1)).map(_._4)
        ordered.zip(ordered.drop(1))
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val got = BehaviorQueries.markovFrom(toDf(evs)).collect()
        .map(r => (r.getAs[String]("cur"), r.getAs[String]("next")) ->
          r.getAs[Long]("n")).toMap
      got == ref
    }
}
