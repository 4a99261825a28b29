package graft

/** Throwaway profiling harness for the churn-model path (not part of
  * the driver contract; run manually). */
object ProfileML {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import org.apache.spark.sql.functions._
    t("c2UserFeatures")(operators.Churn.c2UserFeatures(spark, d).count())
    t("c3ChurnLabel")(operators.Churn.c3ChurnLabel(spark, d).count())
    t("oneHot pivot") {
      sources.Tables.events(spark, d)
        .groupBy(col("user_id")).pivot("event_type",
          Seq("click", "view", "purchase", "signup", "error")).agg(count(lit(1))).count()
    }
    val m = t("featureMatrix+cache") {
      val df = ml.ChurnModel.featureMatrix(spark, d)
      df.count(); df
    }
    val cached = t("matrix cache force") {
      val df = m.withColumn("label", col("churned").cast("double")).coalesce(4).cache()
      df.count(); df
    }
    val train = cached.filter(pmod(col("user_id"), lit(5)) =!= 0)
    val lrOnly = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(25).setRegParam(0.01).setTol(1e-5)
      .setLabelCol("label").setFeaturesCol("features").setProbabilityCol("prob")
    val assembled = t("assemble") {
      val a = new org.apache.spark.ml.feature.VectorAssembler()
        .setInputCols(ml.ChurnModel.FeatureCols.toArray).setOutputCol("features")
        .transform(train).cache()
      a.count(); a
    }
    t("LR fit maxIter=1") {
      new org.apache.spark.ml.classification.LogisticRegression()
        .setMaxIter(1).setRegParam(0.01)
        .setLabelCol("label").setFeaturesCol("features").setProbabilityCol("prob")
        .fit(assembled)
    }
    t("LR fit tol=1e-3") {
      val m = new org.apache.spark.ml.classification.LogisticRegression()
        .setMaxIter(25).setRegParam(0.01).setTol(1e-3)
        .setLabelCol("label").setFeaturesCol("features").setProbabilityCol("prob")
        .fit(assembled)
      println(s"[prof] tol=1e-3 iterations: ${m.summary.totalIterations}")
      m
    }
    t("LR fit alone")(lrOnly.fit(assembled))
    t("c9 run1 (fit+score)") {
      val n = ml.ChurnModel.c9TrainPredict(spark, d).count()
      println(s"[prof] LBFGS iterations: ${ml.ChurnModel.lastFitIterations}")
      n
    }
    t("c9 run2 (memo)")(ml.ChurnModel.c9TrainPredict(spark, d).count())
    t("c13 (save/load/write/read)")(ml.ChurnModel.c13ModelIo(spark, d).count())
    spark.stop()
  }
}
