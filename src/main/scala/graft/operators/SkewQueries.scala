package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Skew handling (SURVEY §7.4.6, O7): AQE's skew-join splitting is the
  * first line of defense (on by default); explicit salting is the
  * engine-level tool for the joins AQE can't split (e.g. a hot build side
  * that must shuffle). [[saltedJoin]] is the reusable operator; the query
  * manufactures a pathological hot key (80% of a 600k-row fact on ONE key)
  * and checks the salted result against a plain-join DuckDB oracle —
  * salting must be a pure execution-strategy change, never a semantic one.
  */
object SkewQueries {

  /** Inner equi-join where `left` is heavily skewed on `key`: left rows get
    * a deterministic salt from `saltFrom` (content hash, not rand() — rand
    * breaks retry/replay determinism), the right side is replicated once
    * per salt, and the join key becomes (key, salt) — splitting each hot
    * key across `nSalts` reducers. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFrom: Seq[Column], nSalts: Int): DataFrame = {
    val salted = left.withColumn("_salt",
      pmod(xxhash64(saltFrom: _*), lit(nSalts)).cast("int"))
    val replicated = right.withColumn("_salt",
      explode(array((0 until nSalts).map(lit): _*)))
    // salting only matters for SHUFFLE joins — if the right side were
    // broadcastable you wouldn't salt at all, and letting Spark broadcast
    // here would silently turn the demo into a no-op. Force the shuffled
    // strategy the technique exists for.
    salted.join(replicated.hint("shuffle_hash"), Seq(key, "_salt"))
      .drop("_salt")
  }

  /** 80% of lineitem lands on one hot key; the dim side carries a factor
    * per key. Salted join → aggregate, oracled by the plain join. */
  def skewSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val fact = Tables(s, dir, "lineitem").select(
      when(col("l_orderkey") % 10 < 8, lit("HOT"))
        .otherwise(concat(lit("K"), col("l_orderkey") % 97)).as("skew_key"),
      col("l_quantity"), col("l_orderkey"), col("l_linenumber"),
      col("l_extendedprice"))
    val dim = fact.select(col("skew_key")).distinct()
      .withColumn("factor", (length(col("skew_key")) % 5 + 1).cast("double"))
    saltedJoin(fact, dim, "skew_key",
      Seq(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice")),
      nSalts = 16)
      .groupBy(col("skew_key"))
      .agg(count(lit(1)).as("n"),
        // round-half-way audit: l_quantity and factor are both
        // integer-valued, so the product and its sum are exact integers
        // in double — round(·, 4) is the identity, no cross-engine hazard
        round(sum(col("l_quantity") * col("factor")), 4).as("weighted"))
      .orderBy(col("skew_key"))
  }

  val skewSaltedJoinSql: String =
    """WITH fact AS (
      |  SELECT CASE WHEN l_orderkey % 10 < 8 THEN 'HOT'
      |              ELSE 'K' || (l_orderkey % 97) END AS skew_key,
      |         l_quantity
      |  FROM lineitem),
      |dim AS (
      |  SELECT DISTINCT skew_key,
      |         CAST(length(skew_key) % 5 + 1 AS DOUBLE) AS factor
      |  FROM fact)
      |SELECT f.skew_key, CAST(count(*) AS BIGINT) AS n,
      |       round(sum(f.l_quantity * d.factor), 4) AS weighted
      |FROM fact f JOIN dim d ON f.skew_key = d.skew_key
      |GROUP BY f.skew_key ORDER BY f.skew_key""".stripMargin

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(("skew_salted_join", skewSaltedJoin _, Some(skewSaltedJoinSql)))
}
