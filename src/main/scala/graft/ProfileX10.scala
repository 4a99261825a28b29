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
