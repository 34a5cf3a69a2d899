package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's "set maker" (main/metadata_set_maker.py:13-110) as a
  * relational pipeline — SURVEY.md §2.8.
  *
  * The reference iterates per-column/per-factor over a wide pandas frame and
  * hand-builds membership bit-vectors keyed by arbitrary-precision ints.
  * Here the wide frame is melted to a fixed-schema long relation
  * `(bioproject, biosample_id, attribute, value)` once, and every rule is a
  * groupBy/window over it — so one Spark job condenses ALL bioprojects,
  * partitioned by the `bioproject` grouping key (the reference needed GNU
  * parallel + a resume file, main/converter.sh:74).
  *
  * Rules reproduced (cites into main/metadata_set_maker.py):
  *   r1 biosample filter (`startswith('SAM')`, :35) — caller-supplied prefix;
  *   r2 drop attributes with nunique <= 1 or == n_biosamples (:46-50);
  *   r3 skip NaN factor values — any [[PandasNaValues]] literal (:57);
  *   r4 skip singleton factors (count == 1, :62-63);
  *   r5 minority-side storage with `include` polarity (count < n/2, :64,74,94);
  *   r6 dedup identical membership vectors across (attribute, value) pairs,
  *      merging labels with '; ' (:89-94).
  */
object MetadataCondenser {

  /** pandas' default `na_values` (pandas `STR_NA_VALUES`,
    * pandas/_libs/parsers.pyx): cells the reference NEVER sees as values,
    * because `read_csv` converts every one of them to NaN before
    * metadata_set_maker.py runs — even under dtype=str — and `nunique()`
    * / the r3 skip exclude NaN (main/metadata_set_maker.py:46,57). The
    * single source of truth for "missing": the condenser rules, the
    * DuckDB pipeline oracles, and the independent test formulations all
    * derive from this constant so the four can never drift apart. */
  val PandasNaValues: Seq[String] = Seq(
    "-1.#IND", "1.#QNAN", "1.#IND", "-1.#QNAN", "#N/A N/A", "#N/A",
    "N/A", "n/a", "NA", "<NA>", "#NA", "NULL", "null", "NaN", "-NaN",
    "nan", "-nan", "None", "")

  /** True when the cell is readable: not NULL and not a pandas NA
    * literal. */
  def isPresent(c: Column): Column =
    c.isNotNull && !c.isin(PandasNaValues: _*)

  /** [[PandasNaValues]] as a SQL IN-list (no member contains a quote). */
  val sqlNaList: String = PandasNaValues.map("'" + _ + "'").mkString(", ")

  /** Melt a wide per-bioproject metadata frame into the long relation.
    * Spark-native `unpivot`; every value is cast to string (the reference
    * reads CSVs as object dtype and str()-ifies, :34). */
  def melt(wide: DataFrame, bioprojectCol: String, biosampleCol: String)
      : DataFrame = {
    val attrs = wide.columns.filterNot(c => c == bioprojectCol || c == biosampleCol)
    wide.select((Seq(col(bioprojectCol).as("bioproject"),
        col(biosampleCol).cast("string").as("biosample_id")) ++
        attrs.map(c => col(c).cast("string").as(c))): _*)
      .unpivot(Array(col("bioproject"), col("biosample_id")),
        attrs.map(col), "attribute", "value")
  }

  /** Condense the long relation into deduplicated metadata sets.
    *
    * Output: (bioproject, attributes, values, members ARRAY<STRING> — the
    * STORED (minority) side, sorted —, n_stored, include, n_biosamples,
    * set_id). Join-ready via [[membership]].
    */
  def condense(long: DataFrame, idPrefix: Option[String] = None): DataFrame = {
    val filtered = idPrefix match {
      case Some(p) => long.filter(col("biosample_id").startsWith(p))
      case None => long
    }

    // n_biosamples per bioproject (reference: len(biosamples_ref), :109)
    // and distinct-value counts per attribute — as aggregate+join, NOT
    // `collect_set(...).over(window)`: a windowed collect_set materializes
    // the whole distinct set PER ROW (O(rows × set size) memory), which is
    // unusable at scale; these joins shuffle only (key, count) pairs, and
    // the per-bioproject side broadcasts.
    val nBs = filtered.groupBy(col("bioproject"))
      .agg(countDistinct(col("biosample_id")).cast("int").as("n_biosamples"))
    // nd treats every pandas NA literal ('nan', 'NA', 'None', …) as
    // MISSING, exactly like the reference: pandas converts those cells to
    // NaN at read time (default na_values) and nunique() excludes NaN —
    // so a column that is constant-except-NA has nunique 1 and is dropped
    // whole. The cross-engine golden oracle (TEST_LARGE fixture: status =
    // 'live' ×295 + 'nan' ×3) caught the over-counting variant emitting
    // sets the reference never produces.
    val nd = filtered.groupBy(col("bioproject"), col("attribute"))
      .agg(countDistinct(when(isPresent(col("value")), col("value")))
        .cast("int").as("nd"))

    val withStats = filtered
      .join(broadcast(nBs), Seq("bioproject"))
      .join(nd, Seq("bioproject", "attribute"))
      // r2: constant or all-unique attributes carry no contrast
      .filter(col("nd") > 1 && col("nd") < col("n_biosamples"))
      // r3: the reference skips real NaN, i.e. every cell pandas read as
      // missing — including string round-trip artifacts like 'nan'
      // (tests :117-124)
      .filter(isPresent(col("value")))

    // per-bioproject biosample universe (the sorted ref list, :25,109);
    // broadcastable — one row per bioproject
    val universe = filtered
      .groupBy(col("bioproject"))
      .agg(sort_array(collect_set(col("biosample_id"))).as("all_members"))

    val perFactor = withStats
      .groupBy(col("bioproject"), col("attribute"), col("value"),
        col("n_biosamples"))
      .agg(sort_array(collect_set(col("biosample_id"))).as("members_raw"))
      .withColumn("cnt", size(col("members_raw")))
      // r4: singleton factors
      .filter(col("cnt") > 1)
      // r5: store the minority side; include == the stored side IS the
      // true side of the contrast
      .withColumn("include", col("cnt") < col("n_biosamples") / 2.0)
      .join(universe, Seq("bioproject"))

    // materialize the stored side (minority) — complement via array_except
    // stays per-bioproject-sized, never cross-bioproject
    val stored = perFactor.withColumn("members",
        when(col("include"), col("members_raw"))
          .otherwise(array_except(col("all_members"), col("members_raw"))))
      .withColumn("n_stored", size(col("members")))

    // r6: identical membership vectors merge their labels ('; '-joined,
    // sorted (attribute, value) for determinism; reference keeps encounter
    // order, which pandas does not guarantee across versions)
    stored
      .groupBy(col("bioproject"), col("include"), col("members"),
        col("n_stored"), col("n_biosamples"))
      // ';'→':' in LABELS ONLY (the reference's delimiter guard,
      // metadata_set_maker.py:68-71) — every GROUPING above ran on the
      // ORIGINAL values, so two factors that differ only by ;/: keep
      // their distinct membership vectors and merely collide in label,
      // exactly like the reference. Replaced BEFORE the sort so the
      // canonical pair order is over the labels actually emitted.
      .agg(sort_array(collect_list(struct(
        translate(col("attribute"), ";", ":").as("attribute"),
        translate(col("value"), ";", ":").as("value"))))
        .as("pairs"))
      .select(
        col("bioproject"),
        array_join(transform(col("pairs"), p => p("attribute")), "; ")
          .as("attributes"),
        array_join(transform(col("pairs"), p => p("value")), "; ")
          .as("values"),
        col("members"), col("n_stored"), col("include"), col("n_biosamples"),
        xxhash64(col("bioproject"), to_json(col("members")), col("include"))
          .as("set_id"))
  }

  /** Explode sets to the join-ready (bioproject, set_id, biosample_id)
    * relation — the idiomatic replacement for the reference's per-row
    * bit-vector scans (SURVEY §1.1). */
  def membership(sets: DataFrame): DataFrame =
    sets.select(col("bioproject"), col("set_id"),
      explode(col("members")).as("biosample_id"))
}
