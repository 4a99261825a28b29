package graft

import org.apache.spark.sql.functions._

/** Throwaway profiling harness for the staged-batch streaming operators
  * (not part of the driver contract; run manually). Splits an operator's
  * wall time into its two phases — fixture staging (stageBatches) vs the
  * streaming query itself — so optimization targets the real cost. */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROF_REPS", "3").toInt
    import graft.sources.Tables
    import graft.streaming.FileStreamSource

    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e9, r)
    }

    for (r <- 1 to reps) {
      // st7's exact batch construction
      val evAll = Tables.events(spark, d)
        .withColumn("ep", expr("ts div 1000000000"))
        .filter(col("event_type").isin("signup", "purchase"))
        .select("event_id", "user_id", "event_type", "ep")
      val batches = Seq(
        "batch0" -> evAll.filter(col("ep") < graft.streaming.Streams.St7Cut1),
        "batch1" -> evAll.filter(col("ep") >= graft.streaming.Streams.St7Cut1 &&
          col("ep") < graft.streaming.Streams.St7Cut2),
        "batch2" -> evAll.filter(col("ep") >= graft.streaming.Streams.St7Cut2))
      val (tStage, _) = time(FileStreamSource.stageBatches("prof_st7", batches))
      val (tFull, n) = time(SparkEntry.queries("st7_stream_stream_join")(spark, d).count())
      println(f"[profst] rep$r st7 stage=${tStage}%.2f s full=${tFull}%.2f s rows=$n")
    }
    for (r <- 1 to reps) {
      val (t, n) = time(SparkEntry.queries("st13_stream_stream_outer")(spark, d).count())
      println(f"[profst] rep$r st13 full=${t}%.2f s rows=$n")
      val (t17, n17) = time(SparkEntry.queries("st17_stream_stream_full_outer")(spark, d).count())
      println(f"[profst] rep$r st17 full=${t17}%.2f s rows=$n17")
    }
    // micro-batch duration breakdown for st7
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.streaming.StreamingQueryProgress]
    graft.streaming.Streams.collectProgress(buf) {
      SparkEntry.queries("st7_stream_stream_join")(spark, d).count()
    }
    buf.zipWithIndex.foreach { case (p, i) =>
      import scala.jdk.CollectionConverters._
      val dm = p.durationMs.asScala.toSeq.sortBy(-_._2).map { case (k, v) => s"$k=$v" }
      println(s"[profst] st7 batch$i rows=${p.numInputRows} ${dm.mkString(" ")}")
    }
    spark.stop()
  }
}
