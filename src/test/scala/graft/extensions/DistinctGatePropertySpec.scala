package graft.extensions

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property gate for [[graft.plans.DistinctGateRewrite]]: over random
  * (group, key) tables — nulls, all-null groups, singleton groups,
  * duplicate-heavy groups — every supported gate spelling must return
  * exactly the groups a plain-Scala distinct count selects, WITH the
  * rule installed. The fixed-fixture spec pins the plan shape and
  * parity against a rule-less session; this covers the value contract
  * on shapes the fixture can't enumerate.
  */
class DistinctGatePropertySpec extends Properties("DistinctGateRewrite") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions())
      .appName("distinct-gate-prop")
      .getOrCreate()
  }

  private val genRows: Gen[Seq[(Long, Option[Long])]] = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.listOfN(n, for {
      g <- Gen.choose(0L, 5L)
      k <- Gen.frequency(
        3 -> Gen.choose(0L, 3L).map(Some(_)),
        1 -> Gen.const(None))
    } yield (g, k))
  } yield rows

  private val spellings = Seq[(String, Long => Boolean)](
    "c >= 2" -> (_ >= 2), "c > 1" -> (_ > 1),
    "2 <= c" -> (_ >= 2), "1 < c" -> (_ > 1),
    "c <= 1" -> (_ <= 1), "c < 2" -> (_ < 2),
    "1 >= c" -> (_ <= 1), "2 > c" -> (_ < 2),
    "c = 1" -> (_ == 1), "1 = c" -> (_ == 1))

  property("all spellings match a plain-Scala distinct count") =
    Prop.forAll(genRows) { rows =>
      import spark.implicits._
      rows.toDF("g", "k").createOrReplaceTempView("prop_t")
      val counts = rows.groupBy(_._1).map { case (g, rs) =>
        g -> rs.flatMap(_._2).distinct.size.toLong
      }
      spellings.forall { case (pred, sel) =>
        val got = spark.sql(
          s"""SELECT g FROM (
             |  SELECT g, count(DISTINCT k) AS c FROM prop_t GROUP BY g
             |) WHERE $pred""".stripMargin)
          .collect().map(_.getLong(0)).toSet
        val want = counts.collect { case (g, c) if sel(c) => g }.toSet
        if (got != want)
          println(s"MISMATCH '$pred': got=$got want=$want rows=$rows")
        got == want
      }
    }
}
