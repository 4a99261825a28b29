package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Manifest-log checkpoints (r20): every K-th commit folds the history
  * summary into one `ckpt_v*.txt`, so DESCRIBE HISTORY reads ONE file
  * + the ≤K fresh manifests above it — O(K), not O(versions). The
  * checkpoint is derived state: readers fall back to the full walk
  * when it's absent, and vacuum-retired versions drop from its rows. */
class CheckpointSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._
  val ST = graft.operators.SnapshotTable
  val SQL = graft.sources.SnapshotSql
  val Engine = graft.operators.Engine

  /** A deep table: one data file, re-listed across `n` commits (each
    * commit stamps its own meta marker). */
  private def deep(name: String, n: Int): String = {
    val root = Engine.tmpDir(s"graft_ckpt_$name")
    Engine.listDir(Paths.get(root)).foreach(Engine.deleteRecursively)
    val rel = ST.writeDataFile((1L to 5L).map(k => (k, k * 1.0)).toDF("k", "v"),
      root, "d")
    val e = Seq(ST.footerEntry(root, rel, "k"))
    ST.commitEntries(root, 0, e, 4, Map("statsCol" -> "k"))
    (2 to n).foreach(i => ST.commitEntries(root, i - 1, e, 4,
      ST.carriedMeta(root, i - 1) + ("mark" -> s"m$i")))
    root
  }

  test("history reads O(K): one checkpoint + the fresh tail, rows exact") {
    val K = ST.CheckpointEvery
    val n = 2 * K + 6 // two checkpoints + a fresh tail of 6
    val root = deep("bound", n)
    assert(ST.listCheckpoints(root).map(_._1) == Seq(2 * K),
      "superseded checkpoint must retire; latest must exist")
    val before = ST.manifestReads.get()
    val rows = SQL.describeHistory(root)
    val reads = ST.manifestReads.get() - before
    assert(rows.map(_._1) == (1 to n), "history must list every version")
    // the naive walk costs >= n manifest reads (historically 3n); the
    // checkpointed walk pays only for the tail above 2K
    assert(reads <= 4L * (n - 2 * K) + 8,
      s"history cost $reads manifest reads for a tail of ${n - 2 * K}")
    // row content matches a live read of the same version
    val live = ST.historyRow(root, K + 3)
    assert(rows.find(_._1 == K + 3).contains(live),
      "checkpointed row diverged from the manifest")
    // cts stays strictly version-monotone through the checkpoint rows
    assert(rows.map(_._2) == rows.map(_._2).sorted)
    assert(rows.last._5.contains(s"mark=m$n"))
  }

  test("vacuum-retired versions drop from checkpointed history; fallback survives") {
    val K = ST.CheckpointEvery
    val root = deep("vac", K + 4)
    ST.vacuum(root, K - 5)
    val rows = SQL.describeHistory(root)
    assert(rows.map(_._1) == (K - 5 to K + 4),
      s"retired versions must vanish from history: ${rows.map(_._1)}")
    // deleting the checkpoint degrades to the full walk, same answer
    ST.listCheckpoints(root).foreach { case (_, p) => Files.delete(p) }
    assert(SQL.describeHistory(root).map(_._1) == (K - 5 to K + 4))
  }

  test("a checkpoint never resurrects a vacuumed version's data cost") {
    // checkpoints are summaries, not liveness: vacuum must not treat
    // them as references, and their presence must not block reclaim
    val K = ST.CheckpointEvery
    val root = deep("noref", K + 1)
    val v1Manifest = ST.manifestPath(root, 1)
    assert(Files.exists(v1Manifest))
    ST.vacuum(root, K)
    assert(!Files.exists(v1Manifest), "vacuum blocked by checkpoint presence")
    assert(SQL.describeHistory(root).map(_._1) == (K to K + 1))
  }
}
