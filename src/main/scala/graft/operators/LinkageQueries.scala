package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Record linkage / entity resolution — the blocked fuzzy join: match
  * dirty free-text records against a canonical catalog by edit
  * distance, with a blocking key bounding the candidate space (the
  * Fellegi–Sunter blocking discipline; an un-blocked fuzzy join is an
  * all-pairs cartesian and does not exist at scale).
  *
  * Fixture: each part's `p_name` is deterministically corrupted by
  * deleting one character (position from the house 60-bit md5 hash of
  * the part key — every engine derives the identical dirty side, so the
  * whole linkage is cross-engine hash-checkable). The canonical catalog
  * is the DISTINCT name set. Blocking key: the name's first character —
  * chosen because the corruption never deletes position 1, i.e. the
  * blocking key is robust to the noise model, which is the actual
  * design requirement of a blocking key.
  *
  * Shape: catalog is tiny per block (distinct names) and broadcasts;
  * the dirty side streams map-side through the block join; candidates
  * per record = |catalog|/|blocks|, so total work is O(records ×
  * block width), never records². Match = levenshtein ≤ 2, survivor =
  * min (distance, name) — a single map-side-combined min(struct) per
  * record, no window.
  */
object LinkageQueries {

  def entityMatch(s: SparkSession, dir: String): DataFrame = {
    val parts = Tables(s, dir, "part")
      .select(col("p_partkey"), col("p_name"))
    val dirty = parts
      // deletion position in [2, len] — never the blocking character
      .withColumn("pos",
        (graft.functions.PortableHash.raw(col("p_partkey")) %
          (length(col("p_name")) - 1) + 2).cast("int"))
      .withColumn("dirty_name",
        concat(expr("substr(p_name, 1, pos - 1)"),
          expr("substr(p_name, pos + 1)")))
      .select(col("p_partkey"), col("p_name"), col("dirty_name"),
        substring(col("dirty_name"), 1, 1).as("blk"))
    val catalog = parts.select(col("p_name").as("cand"))
      .distinct()
      .withColumn("blk", substring(col("cand"), 1, 1))
    dirty.join(broadcast(catalog), Seq("blk"))
      .withColumn("dist", levenshtein(col("dirty_name"), col("cand")))
      .filter(col("dist") <= 2)
      .groupBy(col("p_partkey"), col("p_name"), col("dirty_name"))
      .agg(min(struct(col("dist"), col("cand"))).as("m"))
      .select(col("p_partkey"), col("dirty_name"),
        col("m.cand").as("matched_name"),
        col("m.dist").as("dist"),
        (col("m.cand") === col("p_name")).as("recovered"))
      .orderBy(col("p_partkey"))
  }

  val entityMatchSql: String =
    """WITH dirty AS (
      |  SELECT p_partkey, p_name,
      |         CAST((CAST(('0x' || substr(md5(CAST(p_partkey AS VARCHAR)),
      |                1, 15)) AS BIGINT) % (len(p_name) - 1) + 2)
      |           AS INT) AS pos
      |  FROM part),
      |d2 AS (
      |  SELECT p_partkey, p_name,
      |         substr(p_name, 1, pos - 1) || substr(p_name, pos + 1)
      |           AS dirty_name
      |  FROM dirty),
      |catalog AS (SELECT DISTINCT p_name AS cand FROM part),
      |cands AS (
      |  SELECT d.p_partkey, d.p_name, d.dirty_name, c.cand,
      |         levenshtein(d.dirty_name, c.cand) AS dist
      |  FROM d2 d JOIN catalog c
      |    ON substr(d.dirty_name, 1, 1) = substr(c.cand, 1, 1)
      |  WHERE levenshtein(d.dirty_name, c.cand) <= 2),
      |best AS (
      |  SELECT *, row_number() OVER (PARTITION BY p_partkey
      |           ORDER BY dist, cand) AS rn
      |  FROM cands)
      |SELECT p_partkey, dirty_name, cand AS matched_name,
      |       CAST(dist AS INT) AS dist, cand = p_name AS recovered
      |FROM best WHERE rn = 1 ORDER BY p_partkey""".stripMargin

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(("entity_match", entityMatch _, Some(entityMatchSql)))
}
