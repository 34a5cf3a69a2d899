package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{BehaviorQueries, BloomQueries, BpeQueries, BucketQueries, CollocationQueries, DedupQueries, EmbeddingQueries, EtlQueries, FormatQueries, GraphQueries, IvfQueries, LayoutQueries, LinkageQueries, MultimodalQueries, MwasPipelineQueries, MwasQueries, OpsQueries, ProfileQueries, RelationalExtraQueries, RelationalQueries, RetrievalQueries, SemDedupQueries, SketchQueries, SplitQueries, SkewQueries, StreamingExperimentQueries, StreamingDqQueries, StreamingFunnelQueries, StreamingMarkovQueries, StreamingRetentionQueries, SubstringQueries, TextCorpusQueries, TextQueries, TypeQueries, WarehouseQueries}
import graft.streaming.StreamingQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full MWAS engine: metadata condenser ETL → single-plan pipeline →
    * the reference's 18-column output. */
  def entry(spark: SparkSession): DataFrame =
    MwasPipelineQueries.pipelineQuery(spark, "/root/testdata/sf0.001")

  private def registry
      : Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    RelationalQueries.all ++ MwasQueries.all ++ MwasPipelineQueries.all ++
      DedupQueries.all ++ TextQueries.all ++ StreamingQueries.all ++
      MultimodalQueries.all ++ EtlQueries.all ++ SkewQueries.all ++
      TypeQueries.all ++ RelationalExtraQueries.all ++ BucketQueries.all ++
      IvfQueries.all ++ FormatQueries.all ++ TextCorpusQueries.all ++
      graft.operators.StreamingDedupQueries.all ++ LayoutQueries.all ++
      BloomQueries.all ++ SketchQueries.all ++ SemDedupQueries.all ++
      CollocationQueries.all ++ OpsQueries.all ++
      graft.operators.StreamingSketchQueries.all ++ BehaviorQueries.all ++
      WarehouseQueries.all ++ graft.streaming.StreamingScd2.all ++
      RetrievalQueries.all ++ SplitQueries.all ++ BpeQueries.all ++
      GraphQueries.all ++ ProfileQueries.all ++ LinkageQueries.all ++
      StreamingExperimentQueries.all ++ StreamingMarkovQueries.all ++ StreamingRetentionQueries.all ++ StreamingDqQueries.all ++ StreamingFunnelQueries.all ++
      SubstringQueries.all ++ EmbeddingQueries.all ++
      graft.operators.StreamingMixQueries.all ++
      graft.operators.StreamingRetrievalQueries.all ++
      graft.operators.QualityModelQueries.all ++
      graft.operators.StreamingSubstringQueries.all ++
      graft.operators.StreamingDriftQueries.all ++
      graft.operators.TrainingIoQueries.all ++
      graft.operators.CurationQueries.all ++
      graft.operators.DsirQueries.all ++
      graft.operators.PrivacyQueries.all ++
      graft.operators.RangeJoinQueries.all ++
      graft.operators.StreamingRangeJoinQueries.all ++
      graft.operators.StreamingPcaQueries.all ++
      graft.operators.StreamingIvmQueries.all ++
      graft.operators.StreamingComponentsQueries.all ++
      graft.operators.StreamingLinkageQueries.all ++
      graft.operators.StreamingCurationQueries.all ++
      graft.operators.StreamingPhashQueries.all ++
      graft.operators.StreamingAnnIndexQueries.all

  /** Registry names BEFORE the toMap — exposed so RegistrySmokeSpec can
    * assert uniqueness: a duplicate name anywhere in the concatenation
    * above would silently drop a query from the driver surface (last
    * write wins in toMap) without any test failing. */
  private[graft] def registryNames: Seq[String] = registry.map(_._1)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (name, fn, _) => name -> fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (name, _, Some(sql)) => name -> sql }.toMap
}
