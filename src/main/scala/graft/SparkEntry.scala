package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (plus the training-data extension
  * surface) is registered here as a named query over the driver test
  * tables; SQL-expressible ones carry equivalent DuckDB oracle SQL.
  */
object SparkEntry {

  val allDefs: Seq[QueryDef] =
    SensorOps.all ++ RelationalOps.all ++ ExtraRelationalOps.all ++ AdvancedOps.all ++
      TextOps.all ++ TextOps2.all ++ DedupOps.all ++ SimilarityOps.all ++ IvfOps.all ++
      Multimodal.all ++ SkewOps.all ++ CurationOps.all ++ PqOps.all ++ IvfAdcOps.all ++
      WindowOps.all ++ TextOps3.all ++ BloomOps.all ++ OpqOps.all ++ RelationalOps3.all ++
      IrOps.all ++ PackOps.all ++ HeavyHitterOps.all ++ graft.plans.AsOfOps.all ++
      ProfileOps.all ++ LmOps.all ++ SemDedupOps.all ++ TpchMoreOps.all ++ TpchFullOps.all ++ FunnelOps.all ++
      SampleOps.all ++ ChunkOps.all ++ CovisitOps.all ++ TextStatsOps.all ++ RollingOps.all ++
      DataSelectOps.all ++ EmbedStatsOps.all ++ SubstrDedupOps.all ++ ZOrderOps.all ++
      GraphOps.all ++ ExportOps.all ++ JsonlOps.all ++ SgnsOps.all ++ MiningOps.all ++
      UnigramLmOps.all ++ BpeTrain.all ++ PretrainExportOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_daily_power")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
