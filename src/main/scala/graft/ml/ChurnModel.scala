package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Churn

/** The reference's train/predict stage re-expressed on Spark MLlib:
  * per-user features (Churn.c2) + churn label (Churn.c3) →
  * VectorAssembler → StandardScaler → LogisticRegression → per-user
  * churn probability. Deterministic: fixed seed, deterministic
  * hash-based train/test split (user_id mod), no sampling.
  *
  * Scale: feature assembly is one user_id-clustered aggregation (shared
  * with the rest of the churn family); LBFGS does a handful of
  * treeAggregate passes over the feature matrix — linear scans, no
  * shuffles beyond the aggregation, which is how this survives a 10⁹-user
  * table on a real cluster.
  */
object ChurnModel {

  val FeatureCols: Seq[String] = Seq(
    "n_events", "n_purchases", "n_errors", "total_value", "avg_value",
    "active_days", "span_days", "events_per_active_day")

  /** Per-user features + label matrix (pure DataFrame ops). */
  def featureMatrix(s: SparkSession, d: String): DataFrame =
    Churn.c2UserFeatures(s, d)
      .withColumn("span_days",
        floor((col("last_ep") - col("first_ep")) / lit(86400.0)).cast("long"))
      .withColumn("events_per_active_day",
        col("n_events").cast("double") / col("active_days"))
      .join(Churn.c3ChurnLabel(s, d).select("user_id", "churned"), "user_id")

  /** c9_churn_train_predict — fit on the hash-split train fold, score
    * every user. Output: user_id, churned, churn_prob, prediction. */
  def c9TrainPredict(s: SparkSession, d: String): DataFrame = {
    // cache: LBFGS iterates over the matrix; without this every pass
    // would recompute the per-user aggregations. The matrix is tiny
    // relative to the event log (one row per user), so collapse to a few
    // partitions — iteration cost is scheduler overhead, not compute.
    // (On a 10⁹-user cluster: size partitions to ~128MB of features
    // instead; the shape of the pipeline is unchanged.)
    val data = featureMatrix(s, d)
      .withColumn("label", col("churned").cast("double"))
      .coalesce(4)
      .cache()
    val train = data.filter(pmod(col("user_id"), lit(5)) =!= 0)

    val pipeline = new Pipeline().setStages(Array(
      new VectorAssembler()
        .setInputCols(FeatureCols.toArray)
        .setOutputCol("raw_features"),
      new StandardScaler()
        .setInputCol("raw_features").setOutputCol("features")
        .setWithMean(true).setWithStd(true),
      new LogisticRegression()
        .setMaxIter(25)
        .setRegParam(0.01)
        .setLabelCol("label")
        .setFeaturesCol("features")
        .setProbabilityCol("prob")))

    val model = pipeline.fit(train)
    val firstProb = udf((v: org.apache.spark.ml.linalg.Vector) => v(1))
    model.transform(data)
      .select(col("user_id"), col("churned"),
        round(firstProb(col("prob")), 6).as("churn_prob"),
        col("prediction").cast("long").as("prediction"),
        (pmod(col("user_id"), lit(5)) === 0).cast("long").as("is_test"))
      .orderBy("user_id")
  }
}
