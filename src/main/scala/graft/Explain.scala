package graft
import java.nio.file.{Files, Paths}

/** Plan-capture aid for the optimization rounds: dumps
  * `.explain("formatted")` for each named query to
  * `$SPARK_GRAFT_EXPLAIN_DIR/<query>_$SPARK_GRAFT_EXPLAIN_SUFFIX.txt`.
  * Query names come from args (default: a small relational sample).
  * Session parity with Bench: same GraftSession, same core count from
  * SPARK_GRAFT_CPUS, data dir from SPARK_GRAFT_SF_DIR.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_DIR", "/root/repo/plans/r21")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_SUFFIX", "before")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "q3_join_agg", "q5_multijoin")
    Files.createDirectories(Paths.get(outDir))
    for (q <- names) {
      val df = SparkEntry.queries(q)(spark, d)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.write(Paths.get(outDir, s"${q}_$suffix.txt"), txt.getBytes("UTF-8"))
      println(s"wrote $outDir/${q}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
