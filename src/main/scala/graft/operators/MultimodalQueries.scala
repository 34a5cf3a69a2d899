package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Multimodal-column plumbing (BASELINE.json scale100 extensions): media as
  * opaque `binary` payloads + a typed metadata struct, with
  * decode / feature-extraction / frame-sampling / resize as Spark-side
  * pipelines.
  *
  * The container has no image/audio codecs, so the DECODE KERNEL IS A
  * DETERMINISTIC STUB (byte statistics standing in for pixel decoding —
  * clearly marked below). Everything around it is real and tested: the
  * binary schema, the typed-Dataset `mapPartitions` batch path (the Scala
  * equivalent of `mapInPandas` — one iterator per partition, so a real
  * codec would amortize model/codec init per partition exactly like a
  * Pandas-UDF batch), the metadata projection, and the explode-based frame
  * sampler. Swapping the stub for javacv/ffmpeg changes one function.
  *
  * The media table derives deterministically from `documents` (payload =
  * UTF-8 bytes of `text` standing in for an encoded frame; metadata from
  * doc_id), so DuckDB can oracle every query bit-for-bit.
  */
/** Typed rows for the mapPartitions batch path. Top-level (not nested in
  * the object) because Catalyst's generated projections need public access
  * to the case-class accessors. */
case class MediaRow(doc_id: Long, format: String, width: Long,
    height: Long, n_frames: Long, payload: Array[Byte])

case class FeatureRow(doc_id: Long, format: String,
    payload_len: Long, byte_sum: Long, first_byte: Long, last_byte: Long)

case class PhashRow(doc_id: Long, phash: Long)

object MultimodalQueries {

  /** (doc_id, format, width, height, n_frames, payload BINARY). */
  private def media(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
      col("doc_id"),
      element_at(array(lit("png"), lit("jpg"), lit("mp4"), lit("wav")),
        (col("doc_id") % 4 + 1).cast("int")).as("format"),
      (lit(64) + (col("doc_id") % 16) * 8).cast("long").as("width"),
      (lit(48) + (col("doc_id") % 12) * 8).cast("long").as("height"),
      (col("doc_id") % 30 + 1).cast("long").as("n_frames"),
      encode(col("text"), "UTF-8").as("payload"))


  /** Per-partition batch "decode": iterate the partition's rows once,
    * emitting a feature row per media item.
    *
    * ==== STUB ==== the real decoder (image decode → pixel stats, audio →
    * spectral features) needs codec libraries absent from this container;
    * the deterministic stand-in extracts byte statistics so the full
    * mapPartitions path stays end-to-end testable. */
  private def decodeStub(rows: Iterator[MediaRow]): Iterator[FeatureRow] =
    rows.map { r =>
      val p = r.payload
      FeatureRow(r.doc_id, r.format, p.length.toLong,
        p.foldLeft(0L)((acc, b) => acc + (b & 0xff)),
        if (p.isEmpty) -1L else (p.head & 0xff).toLong,
        if (p.isEmpty) -1L else (p.last & 0xff).toLong)
    }

  /** Binary feature extraction through the typed mapPartitions batch path. */
  def mmDecodeFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    media(s, dir).as[MediaRow]
      .mapPartitions(decodeStub)
      .toDF()
      .orderBy(col("doc_id"))
  }

  val mmDecodeFeaturesSql: String =
    """SELECT doc_id,
      |  ['png','jpg','mp4','wav'][CAST(doc_id % 4 + 1 AS INT)] AS format,
      |  CAST(strlen(text) AS BIGINT) AS payload_len,
      |  CAST(list_sum(list_transform(range(1, length(text) + 1),
      |    i -> ord(substr(text, CAST(i AS INT), 1)))) AS BIGINT) AS byte_sum,
      |  CAST(ord(substr(text, 1, 1)) AS BIGINT) AS first_byte,
      |  CAST(ord(substr(text, -1, 1)) AS BIGINT) AS last_byte
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Video-style frame sampling: every 5th frame index, with a
    * deterministic per-frame key (the handle a real pipeline would use to
    * address the decoded frame blob). Explode keeps it distributed — one
    * output row per sampled frame, no driver loop. */
  def mmFrameSample(s: SparkSession, dir: String): DataFrame =
    media(s, dir).filter(col("format") === "mp4")
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(5L)))
          .as("frame_idx"))
      .withColumn("frame_key",
        md5(concat_ws(":", col("doc_id"), col("frame_idx"))))
      .orderBy(col("doc_id"), col("frame_idx"))

  val mmFrameSampleSql: String =
    """SELECT doc_id, n_frames, frame_idx,
      |       md5(doc_id || ':' || frame_idx) AS frame_key
      |FROM (
      |  SELECT doc_id, CAST(doc_id % 30 + 1 AS BIGINT) AS n_frames,
      |         unnest(range(0, doc_id % 30 + 1, 5)) AS frame_idx
      |  FROM documents WHERE doc_id % 4 = 2)
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** Aspect-preserving resize planning into a 224×224 box (the tensor-prep
    * step before a vision encoder) — pure expression math. */
  def mmResizeMeta(s: SparkSession, dir: String): DataFrame = {
    val scale = least(lit(224.0) / col("width"), lit(224.0) / col("height"))
    media(s, dir).select(
      col("doc_id"), col("format"), col("width"), col("height"),
      floor(col("width") * scale).cast("long").as("out_w"),
      floor(col("height") * scale).cast("long").as("out_h"))
      .orderBy(col("doc_id"))
  }

  val mmResizeMetaSql: String =
    """SELECT doc_id,
      |  ['png','jpg','mp4','wav'][CAST(doc_id % 4 + 1 AS INT)] AS format,
      |  width, height,
      |  CAST(floor(width * least(224.0 / width, 224.0 / height)) AS BIGINT)
      |    AS out_w,
      |  CAST(floor(height * least(224.0 / width, 224.0 / height)) AS BIGINT)
      |    AS out_h
      |FROM (
      |  SELECT doc_id,
      |    CAST(64 + (doc_id % 16) * 8 AS BIGINT) AS width,
      |    CAST(48 + (doc_id % 12) * 8 AS BIGINT) AS height
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Perceptual-hash near-dup over the media payloads — the aHash
    * pipeline image dedup actually runs (CA-Net/LAION-style): hash the
    * DECODED content into a small fingerprint whose bits survive benign
    * re-encodes, then pair fingerprints within a hamming radius. The
    * fingerprint here is a 48-bit block-mean hash over the payload BYTES
    * (bit j = block j's mean ≥ global mean — with a real codec this is
    * the same formula over an 8×8 luma downsample; the byte stand-in
    * keeps the arithmetic INTEGER-EXACT, `blocksum·n ≥ total·bllen`, so
    * DuckDB re-derives it bit-for-bit via `ord()` — no float means).
    *
    * The corpus is the media table plus its deterministic "re-encode"
    * arm: every 10th payload duplicated with ONE flipped mid-payload
    * byte (length-preserving — the lossy-reencode analog; measured: all
    * 50 planted pairs land at hamming ≤ 3, zero cross-pairs do).
    *
    * Scale shape: hashing runs in the same compiled `mapPartitions`
    * batch path as the decode kernel (one pass per payload, no
    * interpreted per-byte lambdas); pairing is the exact pigeonhole
    * 4×12-bit block join of [[DedupQueries.dedupSimhash]] — hamming ≤ 3
    * over 4 blocks forces one identical block, so candidates shuffle on
    * 12-bit bucket values and nothing is all-pairs. The oracle states
    * the O(n²) pair join directly (correctness-only side). */
  /** The phash corpus: documents plus the deterministic "re-encode" arm
    * (every 10th payload with one flipped mid-payload byte), hashed to
    * the 48-bit integer-exact block-mean fingerprint — shared by the
    * n_near profile ([[mmPhashDedup]]) and the clustering operator
    * ([[dedupImagePhash]]). */
  private def phashRel(s: SparkSession, dir: String): DataFrame =
    phashOf(phashCorpusDocs(s, dir))

  /** The phash corpus BEFORE hashing: base documents plus the
    * deterministic re-encode arm (every 10th text with one flipped
    * mid-payload byte, doc_id offset by 1,000,000) — factored so the
    * incremental twin ([[StreamingPhashQueries]]) can stage the SAME
    * corpus as arrival-ordered batches. */
  private[operators] def phashCorpusDocs(s: SparkSession,
      dir: String): DataFrame = {
    val reencoded = Tables(s, dir, "documents")
      .filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(
          expr("substr(text, 1, length(text) div 2 - 1)"), lit("z"),
          expr("substr(text, length(text) div 2 + 1)")).as("text"))
    Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      .unionByName(reencoded)
  }

  /** 48-bit integer-exact block-mean hash of each row's UTF-8 payload —
    * one narrow compiled `mapPartitions` pass over (doc_id, text), the
    * batch/stream-shared hashing kernel. */
  private[operators] def phashOf(corpus: DataFrame): DataFrame = {
    val sp = corpus.sparkSession
    import sp.implicits._
    corpus
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        // integer-exact aHash: same `(j·n)÷48` block boundaries and
        // cross-multiplied mean test as the oracle SQL
        val n = p.length
        var total = 0L
        var i = 0
        while (i < n) { total += (p(i) & 0xff); i += 1 }
        var hash = 0L
        var j = 0
        while (j < 48) {
          val lo = j * n / 48
          val hi = (j + 1) * n / 48
          if (hi > lo) {
            var bs = 0L
            var k = lo
            while (k < hi) { bs += (p(k) & 0xff); k += 1 }
            if (bs * n >= total * (hi - lo)) hash |= 1L << j
          }
          j += 1
        }
        PhashRow(id, hash)
      })
      .toDF()
  }

  /** EXACT hamming ≤ 3 pair relation over the phash corpus via the
    * pigeonhole 4×12-bit block join ([[DedupQueries.dedupSimhash]]'s
    * trick): distance ≤ 3 over 4 blocks forces one identical block, so
    * candidates shuffle on 12-bit bucket values and nothing is
    * all-pairs — and unlike MinHash banding the candidate set is a
    * PROVABLE superset of the radius, so the verified relation equals
    * the exhaustive sweep exactly (PhashClusterSpec pins set equality
    * on the fixture). */
  private def phashNearPairs(hashed: DataFrame): DataFrame = {
    val blocked = phashBlocks(hashed, "doc_id", "phash")
    blocked.as("x").join(blocked.as("y"),
        col("x.blk") === col("y.blk") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.phash").as("ha"), col("y.phash").as("hb"))
      .distinct()
      .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= 3)
  }

  /** A phash relation exploded to the (blk, bv) 12-bit bucket grain —
    * the ONE banding definition shared by the batch pair join above and
    * the incremental store probe ([[StreamingPhashQueries]]); a drifted
    * re-implementation on either side would silently break the
    * pigeonhole completeness bound. */
  private[operators] def phashBlocks(hashed: DataFrame, idAs: String,
      hAs: String): DataFrame =
    hashed.select(col("doc_id").as(idAs), col("phash").as(hAs),
      explode(array((0 until 4).map(j => struct(lit(j).as("blk"),
        shiftright(col("phash"), j * 12).bitwiseAND(0xfffL)
          .as("bv"))): _*)).as("e"))
      .select(col(idAs), col(hAs), col("e.blk"), col("e.bv"))

  def mmPhashDedup(s: SparkSession, dir: String): DataFrame = {
    val hashed = phashRel(s, dir).localCheckpoint()
    val near = phashNearPairs(hashed)
    val cnt = near.select(col("doc_a").as("doc_id"))
      .union(near.select(col("doc_b")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_near"))
    hashed.join(cnt, Seq("doc_id"), "left_outer")
      .na.fill(Map("n_near" -> 0L))
      .select(col("doc_id"), col("phash"), col("n_near"))
      .orderBy(col("doc_id"))
  }

  /** Image near-dup CLUSTERING on perceptual-hash hamming distance —
    * the keep-one-per-group operator image curation ships (the Jaccard/
    * cosine dedup family's missing hamming-space member): pigeonhole-
    * banded hamming ≤ 3 pairs ([[phashNearPairs]], exact by the block
    * bound) contracted through the shared star rounds
    * ([[DedupQueries.connectedComponents]]), survivor = component-min
    * doc_id. Transitivity is the point — A≈B and B≈C must share one
    * survivor even when d(A,C) > 3 (re-encode chains), exactly the gap
    * [[DedupQueries.dedupComponents]] closes for text. Oracle: the
    * exhaustive O(n²) hamming join + recursive-CTE closure (the
    * correctness-only side; the banded Spark arm never goes all-pairs). */
  def dedupImagePhash(s: SparkSession, dir: String): DataFrame = {
    val hashed = phashRel(s, dir).localCheckpoint()
    val comp = DedupQueries.connectedComponents(
        phashNearPairs(hashed)
          .select(col("doc_a").as("u"), col("doc_b").as("v")))
      .select(col("u").as("doc_id"), col("v").as("component"))
    hashed.join(comp, Seq("doc_id"), "left_outer")
      .withColumn("component", coalesce(col("component"), col("doc_id")))
      .withColumn("keep", col("doc_id") === col("component"))
      .select(col("doc_id"), col("phash"), col("component"), col("keep"))
      .orderBy(col("doc_id"))
  }

  val mmPhashDedupSql: String =
    """WITH base AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000,
      |         substr(text, 1, strlen(text)//2 - 1) || 'z' ||
      |         substr(text, strlen(text)//2 + 1)
      |  FROM documents WHERE doc_id % 10 = 0),
      |m AS (
      |  SELECT doc_id, strlen(text) AS n,
      |    list_transform(range(1, strlen(text)+1),
      |      i -> ord(substr(text, CAST(i AS INT), 1))) AS codes
      |  FROM base),
      |s AS (
      |  SELECT doc_id, CAST(list_sum(list_transform(range(0, 48), j ->
      |    CASE WHEN ((j+1)*n)//48 - (j*n)//48 > 0
      |          AND list_sum(list_transform(
      |                range((j*n)//48 + 1, ((j+1)*n)//48 + 1),
      |                i -> codes[CAST(i AS INT)])) * n
      |              >= list_sum(codes) * (((j+1)*n)//48 - (j*n)//48)
      |         THEN (1::BIGINT << CAST(j AS INT)) ELSE 0::BIGINT END))
      |    AS BIGINT) AS phash
      |  FROM m),
      |near AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db FROM s a JOIN s b
      |  ON a.doc_id < b.doc_id AND bit_count(xor(a.phash, b.phash)) <= 3),
      |cnt AS (
      |  SELECT d AS doc_id, CAST(count(*) AS BIGINT) AS n_near
      |  FROM (SELECT da AS d FROM near UNION ALL SELECT db FROM near)
      |  GROUP BY 1)
      |SELECT s.doc_id, s.phash, coalesce(c.n_near, 0) AS n_near
      |FROM s LEFT JOIN cnt c ON s.doc_id = c.doc_id
      |ORDER BY s.doc_id""".stripMargin

  /** The phash-corpus CTEs (base → byte codes → 48-bit hash) shared by
    * both phash oracles — identical text to the n_near oracle's head. */
  private val phashCtesSql: String =
    """base AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000,
      |         substr(text, 1, strlen(text)//2 - 1) || 'z' ||
      |         substr(text, strlen(text)//2 + 1)
      |  FROM documents WHERE doc_id % 10 = 0),
      |m AS (
      |  SELECT doc_id, strlen(text) AS n,
      |    list_transform(range(1, strlen(text)+1),
      |      i -> ord(substr(text, CAST(i AS INT), 1))) AS codes
      |  FROM base),
      |s AS (
      |  SELECT doc_id, CAST(list_sum(list_transform(range(0, 48), j ->
      |    CASE WHEN ((j+1)*n)//48 - (j*n)//48 > 0
      |          AND list_sum(list_transform(
      |                range((j*n)//48 + 1, ((j+1)*n)//48 + 1),
      |                i -> codes[CAST(i AS INT)])) * n
      |              >= list_sum(codes) * (((j+1)*n)//48 - (j*n)//48)
      |         THEN (1::BIGINT << CAST(j AS INT)) ELSE 0::BIGINT END))
      |    AS BIGINT) AS phash
      |  FROM m)""".stripMargin

  val dedupImagePhashSql: String =
    s"""WITH RECURSIVE $phashCtesSql,
      |pairs AS (
      |  SELECT a.doc_id AS pa, b.doc_id AS pb FROM s a JOIN s b
      |  ON a.doc_id < b.doc_id
      |    AND bit_count(xor(a.phash, b.phash)) <= 3),
      |sym AS (SELECT pa AS a, pb AS b FROM pairs
      |        UNION ALL SELECT pb, pa FROM pairs),
      |reach(a, b) AS (
      |  SELECT a, b FROM sym
      |  UNION
      |  SELECT r.a, x.b FROM reach r JOIN sym x ON r.b = x.a
      |  WHERE x.b <> r.a)
      |SELECT s.doc_id, s.phash,
      |       least(s.doc_id, coalesce(min(r.b), s.doc_id)) AS component,
      |       least(s.doc_id, coalesce(min(r.b), s.doc_id)) = s.doc_id
      |         AS keep
      |FROM s LEFT JOIN reach r ON r.a = s.doc_id
      |GROUP BY s.doc_id, s.phash
      |ORDER BY s.doc_id""".stripMargin

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(
      ("mm_decode_features", mmDecodeFeatures _, Some(mmDecodeFeaturesSql)),
      ("mm_frame_sample", mmFrameSample _, Some(mmFrameSampleSql)),
      ("mm_resize_meta", mmResizeMeta _, Some(mmResizeMetaSql)),
      ("mm_phash_dedup", mmPhashDedup _, Some(mmPhashDedupSql)),
      ("dedup_image_phash", dedupImagePhash _, Some(dedupImagePhashSql)))
}
