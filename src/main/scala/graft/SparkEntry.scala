package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory and §6 for the oracle conventions. */
object SparkEntry {

  /** All operator families, merged. Each family exposes
    * name → (builder, optional DuckDB oracle SQL). */
  private lazy val all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] =
    Relational.entries ++ Churn.entries ++ TextAnalysis.entries ++
      Dedup.entries ++ Similarity.entries ++ Multimodal.entries ++
      Engine.entries ++ SnapshotTable.entries ++ Pipeline.entries ++
      graft.streaming.Streams.entries ++ Map(
        "c9_churn_train_predict" ->
          ((graft.ml.ChurnModel.c9TrainPredict _): (SparkSession, String) => DataFrame,
            None: Option[String]),
        "c13_model_io" ->
          ((graft.ml.ChurnModel.c13ModelIo _): (SparkSession, String) => DataFrame,
            None: Option[String]),
        "c15_model_metrics" ->
          ((graft.ml.ChurnModel.c15ModelMetrics _): (SparkSession, String) => DataFrame,
            None: Option[String]))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q5Multijoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, (fn, _)) => k -> fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, (_, Some(sql))) => k -> sql }
}
