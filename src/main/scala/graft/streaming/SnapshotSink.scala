package graft.streaming

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Engine, SnapshotTable => ST}
import graft.sources.Tables

/** The streaming side of the snapshot table: a `foreachBatch` sink that
  * commits each micro-batch through the manifest protocol with
  * EXACTLY-ONCE semantics.
  *
  * Structured Streaming's foreachBatch contract is at-least-once: after
  * a crash the restarted query replays the last unacknowledged batch
  * with the SAME batchId. The sink upgrades that to exactly-once the
  * way Delta's streaming sink does (txnAppId/txnVersion): every commit
  * stores the batch id in the manifest's metadata — atomically with the
  * file list it describes — and a writer first reads the current
  * version's metadata and SKIPS any batch at or below the recorded id.
  * Replay becomes a no-op; no row lands twice, no batch is lost.
  *
  * Scale shape: each micro-batch appends O(batch) new data files and
  * commits O(entries/shardSize) manifest shards + one pointer file; the
  * table's history is the stream's offset log. A 1000-executor cluster
  * runs the same code — the data-file write is a distributed Spark
  * write, and only the manifest commit (tiny, metadata-only) runs on
  * the driver, exactly where a table format's commit runs.
  */
object SnapshotSink {

  private val LastBatchKey = "last_batch"

  /** Append one micro-batch to the table, exactly once. Returns true if
    * this call committed, false if the batch id was already committed
    * (a replay — the no-op path a restarted query takes). Safe under
    * writer races: the manifest CAS detects a concurrent commit, the
    * loser re-reads (fresh entry list AND fresh last-batch id) and
    * retries or skips; retries are bounded with stale-claim reclaim
    * ([[graft.operators.SnapshotTable.CommitRetry]]) so a dead
    * committer's zero-byte claim can never wedge the stream. */
  private[graft] def appendBatch(root: String, df: DataFrame, batchId: Long,
      keyCol: String = "ep_day", shardSize: Int = 4): Boolean = {
    def lastCommitted(v: Int): Long =
      if (v == 0) -1L
      else ST.manifestMeta(root, v).get(LastBatchKey).map(_.toLong).getOrElse(-1L)
    if (batchId <= lastCommitted(ST.currentVersion(root))) return false
    // write the batch's data files ONCE, outside the commit-retry loop —
    // a CAS loss invalidates the manifest attempt, not the immutable
    // data files (uuid-tagged so attempts never collide; abandoned
    // files are unreferenced and vacuum reclaims them). One file PER
    // TASK: the batch lands at the stream's own parallelism — at
    // production batch sizes every executor writes its partition, only
    // the tiny manifest commit runs on the driver.
    val tag = f"b$batchId%05d_${java.util.UUID.randomUUID().toString.take(8)}"
    val entries = ST.writeDataFiles(df, root, tag).map(ST.footerEntry(root, _, keyCol))
    val retry = new ST.CommitRetry(root)
    while (true) {
      val v = ST.currentVersion(root)
      retry.observed(v)
      if (batchId <= lastCommitted(v)) return false // raced replay: someone committed it
      val base = if (v == 0) Nil else ST.manifestEntries(root, v) // v0 = empty table, no manifest
      try {
        // carriedMeta: a batch commit must not erase the statsCol or
        // another stream's epoch watermark committed before it
        ST.commitEntries(root, v, base ++ entries,
          shardSize, ST.carriedMeta(root, v) + (LastBatchKey -> batchId.toString))
        return true
      } catch {
        case e: java.nio.file.FileAlreadyExistsException => retry.lost(e) // CAS lost: re-read, retry
      }
    }
    false // unreachable
  }

  /** st8's ingest-batch boundaries (epoch days; the events table spans
    * 19723..19752 at every SF): three day-aligned slices — the nightly
    * feed shape a warehouse ingests. */
  private[graft] val St8Cut1 = 19733L
  private[graft] val St8Cut2 = 19743L

  /** st8_stream_snapshot_sink — the end-to-end ingest path a production
    * churn warehouse runs: events arrive as chronological micro-batches
    * (file replay here, Kafka in deployment — [[StreamSource]]), each
    * batch is committed to a [[graft.operators.SnapshotTable]] with its
    * footer-harvested ep_day stats and its batch id, and the final
    * table — readable, time-travelable, stats-prunable — holds every
    * event exactly once. The returned day-grain aggregate over the
    * committed table therefore equals the same aggregate over the raw
    * event log, which is exactly what the DuckDB oracle computes.
    * StreamingSinkSpec replays a committed batch to pin the no-op path
    * and checks one manifest version per micro-batch. */
  def st8StreamSnapshotSink(s: SparkSession, d: String): DataFrame = {
    val root = Engine.tmpDir("graft_st8_table")
    Engine.listDir(Paths.get(root)).foreach(Engine.deleteRecursively)
    val ckpt = Engine.tmpDir("graft_st8_ckpt")
    Engine.listDir(Paths.get(ckpt)).foreach(Engine.deleteRecursively)
    val ev = Tables.events(s, d)
      .withColumn("ep_day", expr("(ts div 1000000000) div 86400"))
      .select("event_id", "user_id", "event_type", "value", "ep_day")
    val batches = Seq(
      "batch0" -> ev.filter(col("ep_day") < St8Cut1),
      "batch1" -> ev.filter(col("ep_day") >= St8Cut1 && col("ep_day") < St8Cut2),
      "batch2" -> ev.filter(col("ep_day") >= St8Cut2))
    val q = Streams.source.batched(s, "st8", ev.schema, batches)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // shardSize=2: the run's commits cross the inline→sharded
        // manifest threshold, so batch-id metadata provably survives
        // both layouts at gate scale
        appendBatch(root, batch, batchId, shardSize = 2); ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    ST.read(s, root)
      .groupBy(col("ep_day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("value_sum"))
      .orderBy("ep_day")
  }

  val st8Sql: String =
    """WITH e AS (SELECT CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS ep_day, value
      |  FROM events)
      |SELECT ep_day, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
      |FROM e GROUP BY ep_day ORDER BY ep_day""".stripMargin
}
