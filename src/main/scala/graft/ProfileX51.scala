package graft

import org.apache.spark.sql.functions._

/** Throwaway profiling harness for x51_reorg_purge (not part of the
  * driver contract; run manually): times each fixture phase — staging,
  * DV enable, the two sparse DELETEs, the REORG rewrite, the final
  * DSv2 read-back — so optimization targets the real cost. */
object ProfileX51 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROF_REPS", "2").toInt
    val ST = graft.operators.SnapshotTable
    val Engine = graft.operators.Engine

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profx51] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (r <- 1 to reps) {
      println(s"[profx51] === rep $r")
      val root = Engine.tmpDir(s"graft_profx51_$r")
      Engine.listDir(java.nio.file.Paths.get(root)).foreach(Engine.deleteRecursively)
      time("stage+commit") {
        ST.commitEntries(root, 0, ST.stageDayClustered(spark, d, root), shardSize = 3,
          Map("statsCol" -> "ep_day"))
      }
      time("enableDV") { ST.enableDeletionVectors(root) }
      time("delete1") { spark.sql(s"DELETE FROM '$root' WHERE event_id % 991 = 1").collect() }
      time("delete2") { spark.sql(s"DELETE FROM '$root' WHERE event_id % 991 = 2").collect() }
      time("reorg") { spark.sql(s"REORG TABLE '$root' APPLY (PURGE)").collect() }
      time("readback-agg") {
        spark.read.format("graft-snapshot").load(root)
          .groupBy(col("ep_day"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(18,6)")).cast("double").as("value_sum"))
          .orderBy("ep_day").count()
      }
    }
    spark.stop()
  }
}
