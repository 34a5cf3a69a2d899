package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for [[StringArrayIntersectSize]]: value parity with
  * the `size(array_intersect(...))` spelling it replaces — incl. the
  * distinct semantics under duplicates — on both the codegen and
  * interpreted paths, plus the SQL registration. */
class ArrayOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .appName("array-ops-spec")
    .getOrCreate()

  private def pairs: Seq[(Seq[String], Seq[String])] = {
    val rng = new scala.util.Random(42)
    val pool = Vector("a", "b", "c", "δ", "e f", "", "longer_token")
    val random = Seq.fill(60)((
      Seq.fill(rng.nextInt(8))(pool(rng.nextInt(pool.length))),
      Seq.fill(rng.nextInt(8))(pool(rng.nextInt(pool.length)))))
    random ++ Seq(
      (Seq("a", "a", "b"), Seq("a")),           // dupes left
      (Seq("a"), Seq("a", "a", "b")),           // dupes right
      (Seq.empty[String], Seq("a")),            // empty side
      (Seq("a", "b"), Seq.empty[String]),
      // null ELEMENTS: array_intersect counts a both-sides null once
      (Seq("a", null), Seq(null, "b")),
      (Seq(null, null, "a"), Seq(null, "a")),
      (Seq("a", null), Seq("b")))
  }

  test("matches size(array_intersect) incl. duplicate semantics") {
    import spark.implicits._
    val df = pairs.toDF("xs", "ys")
    val rows = df.select(
      ArrayOps.intersect_size(col("xs"), col("ys")).as("got"),
      size(array_intersect(col("xs"), col("ys"))).as("want"))
      .collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("interpreted eval agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.types._
    def lit(xs: Seq[String]) = Literal(
      ArrayData.toArrayData(xs.map(UTF8String.fromString).toArray),
      ArrayType(StringType))
    pairs.foreach { case (xs, ys) =>
      val e = StringArrayIntersectSize(lit(xs), lit(ys))
      val expected = (xs.toSet & ys.toSet).size
      assert(e.eval(null) == expected, s"$xs & $ys")
    }
  }

  test("null array yields null; SQL registration works") {
    // the shared test session has no extensions installed — clear and
    // build one with them, the ExtensionsSpec convention
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.extensions.GraftExtensions())
      .appName("array-ops-ext-spec")
      .getOrCreate()
    val r = s.sql(
      "SELECT intersect_size(array('a','b'), array('b','c')) AS s, " +
        "intersect_size(CAST(NULL AS ARRAY<STRING>), array('a')) AS n")
      .head()
    assert(r.getInt(0) == 1)
    assert(r.isNullAt(1))
  }
}
