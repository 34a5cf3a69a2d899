package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for catalog-free entity resolution. The hash oracle
  * proves the relation; THIS pins the construction's recovery theorem
  * and the transitive contract:
  *
  *  - recovery: two corruptions of the SAME original name are single
  *    deletions, so their dirty forms are within levenshtein 2 and
  *    share the (corruption-proof) first-character block — every group
  *    of records with one original p_name MUST land in one entity.
  *  - transitivity: entity ids partition the records, the id is the
  *    min member, and exactly one member per entity is canonical.
  *  - non-vacuity: the fixture yields real multi-record entities and
  *    more than one entity (a degenerate all-in-one or all-singleton
  *    pass would satisfy the above trivially). */
class EntityResolveSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("entity-resolve-spec")
    .getOrCreate()

  test("same-name recovery, min-id canonicals, non-degenerate") {
    val byName = spark.read.parquet(s"$dir/part.parquet")
      .selectExpr("p_partkey", "p_name").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val got = LinkageQueries.entityResolve(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    assert(got.length == byName.length)
    val entity = got.map(t => t._1 -> t._2).toMap

    // recovery theorem: one original name => one entity
    byName.groupBy(_._2).foreach { case (name, keys) =>
      val ents = keys.map(k => entity(k._1)).distinct
      assert(ents.length == 1,
        s"records of '$name' split across entities ${ents.toList}")
    }

    // entity id = min member; exactly one canonical per entity
    got.groupBy(_._2).foreach { case (e, members) =>
      assert(members.map(_._1).min == e)
      assert(members.count(_._3) == 1)
    }

    // non-degenerate: multi-record entities AND multiple entities
    val sizes = got.groupBy(_._2).map(_._2.length)
    assert(sizes.exists(_ > 1), "no multi-record entity resolved")
    assert(sizes.size > 1, "everything collapsed into one entity")
  }
}
