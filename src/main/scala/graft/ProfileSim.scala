package graft

/** Throwaway profiling harness for the similarity/dedup hot rows (not
  * part of the driver contract; run manually). Repeats each query in
  * ONE session so rep 2+ measure steady-state cost (session caches
  * warm), which isolates algorithmic cost from one-time fixture builds
  * under host noise. */
object ProfileSim {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROF_REPS", "4").toInt
    val names = if (args.nonEmpty) args.toSeq
      else Seq("s11_knn_pq", "s12_knn_ivfpq")
    for (q <- names; r <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, d).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[prof] $q rep$r ${dt}%.2f s rows=$n")
    }
    spark.stop()
  }
}
