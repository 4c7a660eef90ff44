package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The query surface is assembled from per-module [[QuerySpec]] lists;
  * each spec carries the Spark implementation and (where
  * SQL-expressible) the DuckDB oracle SQL.
  */
object SparkEntry {

  def allSpecs: Seq[QuerySpec] =
    graft.query.ParityQueries.specs ++
      graft.query.RelationalQueries.specs ++
      graft.query.Maintenance.specs ++
      graft.query.Estimation.specs ++
      graft.query.CustomerAnalytics.specs ++
      graft.ext.TextStats.specs ++
      graft.ext.FeatureEng.specs ++
      graft.ext.Dedup.specs ++
      graft.ext.DupGraph.specs ++
      graft.ext.StreamIngest.specs ++
      graft.ext.Decontam.specs ++
      graft.ext.Similarity.specs ++
      graft.ext.Spatial.specs ++
      graft.ext.Multimodal.specs ++
      graft.ext.TrainPrep.specs ++
      graft.scale.Layout.specs ++
      graft.streaming.StreamingQueries.specs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q21_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allSpecs.map(s => s.name -> s.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allSpecs.collect { case QuerySpec(n, _, Some(sql), _) => n -> sql }.toMap
}
