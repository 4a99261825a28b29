package graft

/** Throwaway profiling harness for x10's compaction stages (not part of
  * the driver contract; run manually — added while chasing the r11→r12
  * x10 drift). */
object ProfileX10 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import org.apache.spark.sql.functions._
    val E = operators.Engine
    // warm like Bench does
    t("warm q1")(sources.Tables.events(spark, d).count())
    val frag = E.tmpDir("graft_frag")
    val compact = E.tmpDir("graft_compact")
    val ev = sources.Tables.events(spark, d)
      .select("event_id", "user_id", "event_type", "value")
    t("stage1 write 64 (cold)")(ev.repartition(64).write.mode("overwrite").parquet(frag))
    t("stage2 rewrite 4 (cold)")(spark.read.parquet(frag).repartition(4)
      .write.mode("overwrite").parquet(compact))
    t("stage3 agg (cold)")(spark.read.parquet(compact)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("value_sum"))
      .orderBy("event_type").collect())
    (1 to 3).foreach { i =>
      t(s"x10 full #$i")(E.x10Compaction(spark, d).collect())
    }
    spark.stop()
  }
}

/** Throwaway profiling harness for c21's cycle stages. */
object ProfileC21 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    t("warm events")(sources.Tables.events(spark, d).count())
    t("model fit (memoized after)")(ml.ChurnModel.c9TrainPredict(spark, d).count())
    val P = operators.Pipeline
    val w = P.freshWarehouse("c21prof")
    t("cycle 0")(P.runCycle(spark, d, w, 0))
    t("cycle 1")(P.runCycle(spark, d, w, 1))
    t("cycle 2")(P.runCycle(spark, d, w, 2))
    spark.stop()
  }
}
