package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming change-data-feed mode of the DSv2 snapshot connector
  * (`.option("readChangeFeed", "true")`): version-offset change
  * streaming that SURVIVES rewrite commits — the append-only guard's
  * counterpart for DML-carrying upstreams. Two grains: cdf=row tables
  * serve commit-time update/delete/insert images (carried rows absent);
  * everything else is file-grain — a rewritten file's carried rows
  * appear as a delete+insert pair, which cancels under the signed
  * folds CDC feeds drive. */
class CdfSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._
  val ST = graft.operators.SnapshotTable

  /** A 3-commit table: v1 CTAS (k 1..6), v2 append (k 7..8), v3
    * copy-on-write DELETE of k <= 2 (rewrites the touched file, the
    * survivor rows carry). Returns its root. */
  private def fixture(name: String): String = {
    val root = graft.operators.Engine.tmpDir(s"graft_cdf_$name")
    graft.operators.Engine.listDir(Paths.get(root))
      .foreach(graft.operators.Engine.deleteRecursively)
    def commitRows(base: Int, rows: Seq[(Long, Double)], tag: String): Int = {
      val rels = ST.writeDataFiles(rows.toDF("k", "v").coalesce(1), root, tag)
        .map(ST.footerEntry(root, _, "k"))
      val carried = if (base == 0) Map("statsCol" -> "k")
        else ST.carriedMeta(root, base)
      val prior = if (base == 0) Nil else ST.manifestEntries(root, base)
      ST.commitEntries(root, base, prior ++ rels, shardSize = 16, carried)
    }
    commitRows(0, (1L to 6L).map(k => (k, k * 1.0)), "a") // v1
    commitRows(1, (7L to 8L).map(k => (k, k * 1.0)), "b") // v2
    ST.delete(spark, root, "k <= 2") // v3: copy-on-write rewrite
    assert(ST.currentVersion(root) == 3)
    root
  }

  private def runFeed(root: String, opts: Map[String, String] = Map.empty): DataFrame = {
    val name = s"cdf_out_${System.nanoTime()}"
    val reader = opts.foldLeft(
      spark.readStream.format("graft-snapshot").option("readChangeFeed", "true")) {
      case (r, (k, v)) => r.option(k, v)
    }
    val q = reader.load(root).writeStream.format("memory").queryName(name).start()
    q.processAllAvailable(); q.stop()
    spark.table(name)
  }

  test("the feed replays every commit; signed fold reproduces the current table") {
    val root = fixture("fold")
    val feed = runFeed(root).collect()
    // every commit is represented, each row tagged with its version
    assert(feed.map(_.getAs[Long]("_commit_version")).toSet == Set(1L, 2L, 3L))
    // the net (signed) multiset of the feed = the current table content
    val net = feed.groupBy(r => (r.getAs[Long]("k"), r.getAs[Double]("v")))
      .view.mapValues(_.map(r =>
        if (r.getAs[String]("_change_type") == "insert") 1 else -1).sum)
      .filter(_._2 != 0).toMap
    assert(net.values.forall(_ == 1), s"net multiplicities must be 0/1: $net")
    val current = ST.read(spark, root).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Double]("v"))).toSet
    assert(net.keySet == current,
      s"signed fold ${net.keySet} != current content $current")
  }

  test("append commits are insert-only; the rewrite commit carries delete+insert pairs") {
    val root = fixture("kinds")
    val feed = runFeed(root)
    val byV = feed.collect().groupBy(_.getAs[Long]("_commit_version"))
    assert(byV(1L).forall(_.getAs[String]("_change_type") == "insert"))
    assert(byV(2L).forall(_.getAs[String]("_change_type") == "insert"))
    assert(byV(2L).map(_.getAs[Long]("k")).toSet == Set(7L, 8L))
    // v3 (the CoW DELETE of k<=2): the touched file's 6 rows stream as
    // deletes, its 4 survivors re-stream as inserts — net = the 2
    // deleted rows, exactly the file-grain contract
    val v3 = byV(3L)
    val dels = v3.filter(_.getAs[String]("_change_type") == "delete").map(_.getAs[Long]("k"))
    val ins = v3.filter(_.getAs[String]("_change_type") == "insert").map(_.getAs[Long]("k"))
    assert(dels.toSet == Set(1L, 2L, 3L, 4L, 5L, 6L), s"deletes: ${dels.toSeq}")
    assert(ins.toSet == Set(3L, 4L, 5L, 6L), s"inserts: ${ins.toSeq}")
    assert((dels.toSet -- ins.toSet) == Set(1L, 2L))
  }

  test("batch boundaries are commit boundaries; startingVersion skips consumed commits") {
    val root = fixture("bounds")
    val batches = new java.util.concurrent.ConcurrentHashMap[Long, Set[Long]]()
    val q = spark.readStream.format("graft-snapshot")
      .option("readChangeFeed", "true").load(root)
      .writeStream.foreachBatch { (df: DataFrame, id: Long) =>
        batches.put(id, df.select("_commit_version").distinct()
          .collect().map(_.getLong(0)).toSet); ()
      }.start()
    q.processAllAvailable(); q.stop()
    import scala.jdk.CollectionConverters._
    // one micro-batch per commit, in order
    assert(batches.asScala.toMap == Map(0L -> Set(1L), 1L -> Set(2L), 2L -> Set(3L)),
      s"batches: ${batches.asScala}")
    // starting past v2 replays only the rewrite commit
    val tail = runFeed(root, Map("startingVersion" -> "2"))
    assert(tail.select("_commit_version").distinct().collect()
      .map(_.getLong(0)).toSet == Set(3L))
  }

  test("projection prunes table columns; metadata-only selections work") {
    val root = fixture("prune")
    // metadata columns interleave anywhere the projection puts them
    val mixed = runFeed(root).select("_change_type", "k", "_commit_version")
    assert(mixed.columns.toSeq == Seq("_change_type", "k", "_commit_version"))
    assert(mixed.count() > 0)
    // a projection with NO metadata columns is a plain change-row read
    assert(runFeed(root).select("k").count() == mixed.count())
    // and one with ONLY metadata columns decodes zero table columns
    assert(runFeed(root).select("_change_type").count() == mixed.count())
  }

  test("a metadata-only commit streams an empty batch instead of erroring") {
    val root = fixture("meta")
    val v = ST.currentVersion(root)
    // same file list re-committed (an ALTER-style metadata commit)
    ST.commitEntries(root, v, ST.manifestEntries(root, v), shardSize = 16,
      ST.carriedMeta(root, v) + ("note" -> "metadata_only"))
    val feed = runFeed(root)
    assert(feed.filter(col("_commit_version") === (v + 1)).count() == 0)
    assert(feed.filter(col("_commit_version") <= v).count() > 0)
  }

  test("checkpoint restart resumes at the committed offset — no replays, no gaps") {
    val root = fixture("ckpt")
    val cp = graft.operators.Engine.tmpDir("graft_cdf_checkpoint_dir")
    graft.operators.Engine.listDir(Paths.get(cp))
      .foreach(graft.operators.Engine.deleteRecursively)
    def run(): Seq[(String, Long, Long)] = {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long)]()
      val q = spark.readStream.format("graft-snapshot")
        .option("readChangeFeed", "true").load(root)
        .writeStream.option("checkpointLocation", cp)
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.collect().foreach(r => got.add((r.getAs[String]("_change_type"),
            r.getAs[Long]("k"), r.getAs[Long]("_commit_version")))); ()
        }.start()
      q.processAllAvailable(); q.stop()
      import scala.jdk.CollectionConverters._
      got.asScala.toSeq
    }
    assert(run().nonEmpty)
    // a new DML commit lands while the stream is down
    ST.delete(spark, root, "k = 7")
    // the restarted stream resumes at the checkpointed offset: ONLY the
    // new commit's changes arrive — no replays, no gaps
    val second = run()
    assert(second.map(_._3).toSet == Set(4L),
      s"restart replayed or skipped: $second")
    assert(second.contains(("delete", 7L, 4L)))
  }

  test("batch CDF reads the version window in one scan, identical to the streamed feed") {
    val root = fixture("batch")
    def batchCdf(opts: (String, String)*) = opts.foldLeft(
      spark.read.format("graft-snapshot").option("readChangeFeed", "true")) {
      case (r, (k, v)) => r.option(k, v)
    }.load(root)
    // full history: batch ≡ streamed feed, row for row
    val all = batchCdf().collect()
      .map(r => (r.getAs[String]("_change_type"), r.getAs[Long]("k"),
        r.getAs[Long]("_commit_version"))).sorted.toSeq
    val streamed = runFeed(root).collect()
      .map(r => (r.getAs[String]("_change_type"), r.getAs[Long]("k"),
        r.getAs[Long]("_commit_version"))).sorted.toSeq
    assert(all == streamed, "batch CDF drifted from the streamed feed")
    // a version window slices the feed; filters run residually.
    // `afterVersion` is the batch option, named for its EXCLUSIVE
    // semantics; `startingVersion` (Delta's inclusive name) refuses
    // loudly on the batch path instead of silently dropping a commit
    val tail = batchCdf("afterVersion" -> "2").collect()
    assert(tail.map(_.getAs[Long]("_commit_version")).toSet == Set(3L))
    val refused = intercept[Exception](batchCdf("startingVersion" -> "2").collect())
    assert(refused.getMessage.contains("afterVersion"), refused.getMessage)
    val only2 = batchCdf("afterVersion" -> "1", "endingVersion" -> "2")
    assert(only2.select("_commit_version").distinct().collect()
      .map(_.getLong(0)).toSet == Set(2L))
    assert(batchCdf().filter(col("_change_type") === "delete").count() ==
      all.count(_._1 == "delete"))
    // an out-of-range window fails loudly
    val e = intercept[Exception](batchCdf("endingVersion" -> "99").collect())
    assert(e.getMessage.contains("out of range"), e.getMessage)
  }

  test("catalog tables stream by name; a name-addressed CDF read refuses loudly") {
    val w = Files.createTempDirectory("graft_cdf_cat").toString
    spark.conf.set("spark.sql.catalog.gcdf", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcdf.root", w)
    spark.sql("CREATE TABLE gcdf.ev (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO gcdf.ev VALUES (1, 1.0), (2, 2.0)")
    spark.sql("INSERT INTO gcdf.ev VALUES (3, 3.0)")
    // plain append streaming by NAME works (the catalog's table carries
    // MICRO_BATCH_READ; offsets are versions exactly like the path route)
    val name = s"cdf_cat_${System.nanoTime()}"
    val q = spark.readStream.table("gcdf.ev")
      .writeStream.format("memory").queryName(name).start()
    q.processAllAvailable(); q.stop()
    assert(spark.table(name).count() == 3)
    // but CDF by name would emit change rows WITHOUT their kind (the
    // metadata columns enter the schema only on the path route's
    // inferSchema) — refused loudly, pointing at the path spelling
    val e = intercept[Exception] {
      spark.readStream.option("readChangeFeed", "true").table("gcdf.ev")
        .writeStream.format("memory").queryName(s"${name}_x").start()
        .processAllAvailable()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(t => t.getMessage != null &&
      t.getMessage.contains("path route")), e.getMessage)
  }

  test("a CDF-maintained MV follows LIVE DML across stream restarts; replays no-op") {
    val bronze = graft.operators.Engine.tmpDir("graft_cdf_mv_bronze")
    val mv = graft.operators.Engine.tmpDir("graft_cdf_mv_table")
    val cp = graft.operators.Engine.tmpDir("graft_cdf_mv_cp")
    Seq(bronze, mv, cp).foreach(p => graft.operators.Engine
      .listDir(Paths.get(p)).foreach(graft.operators.Engine.deleteRecursively))
    def commitRows(base: Int, rows: Seq[(Long, Double)], tag: String): Int = {
      val rels = ST.writeDataFiles(rows.toDF("ep_day", "value").coalesce(1), bronze, tag)
        .map(ST.footerEntry(bronze, _, "ep_day"))
      val prior = if (base == 0) Nil else ST.manifestEntries(bronze, base)
      ST.commitEntries(bronze, base, prior ++ rels, 16,
        if (base == 0) Map("statsCol" -> "ep_day") else ST.carriedMeta(bronze, base))
    }
    commitRows(0, Seq((1L, 10.0), (1L, 20.0), (2L, 30.0)), "a") // v1
    commitRows(1, Seq((2L, 40.0), (3L, 50.0)), "b") // v2
    def run(): Unit = {
      val q = spark.readStream.format("graft-snapshot")
        .option("readChangeFeed", "true").load(bronze)
        .writeStream.option("checkpointLocation", cp)
        .foreachBatch(graft.streaming.Streams.cdfMvBatch(spark, mv) _).start()
      q.processAllAvailable(); q.stop()
    }
    def mvState(): Map[Long, (Long, Double)] = ST.read(spark, mv).collect()
      .map(r => r.getAs[Long]("ep_day") ->
        (r.getAs[Long]("n_events"), r.getAs[java.math.BigDecimal]("value_dec").doubleValue()))
      .toMap
    run()
    assert(mvState() == Map(1L -> (2L, 30.0), 2L -> (2L, 70.0), 3L -> (1L, 50.0)))
    assert(ST.currentVersion(mv) == 2, "one MV replace per source commit")
    // LIVE DML lands while the stream is down: a copy-on-write DELETE
    // that would KILL the plain append pipe — the restarted CDF stream
    // folds it and the MV drops the deleted day entirely
    ST.delete(spark, bronze, "ep_day = 1")
    run()
    assert(mvState() == Map(2L -> (2L, 70.0), 3L -> (1L, 50.0)),
      s"MV did not follow the DML: ${mvState()}")
    assert(ST.currentVersion(mv) == 3)
    // a further restart with nothing new is a full no-op: no version
    run()
    assert(ST.currentVersion(mv) == 3, "replay minted an MV version")
    // and the maintained MV ≡ recompute from the source's final state
    val recomputed = ST.read(spark, bronze).groupBy("ep_day")
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,6)")).as("s"))
      .collect().map(r => r.getAs[Long]("ep_day") ->
        (r.getAs[Long]("n"), r.getAs[java.math.BigDecimal]("s").doubleValue())).toMap
    assert(mvState() == recomputed)
  }

  test("row-grain CDF on x17's merge commit: update images, no carried-row noise") {
    // the merge fixture is cdf=row: its MERGE commit registered CDC
    // files, so the feed's v2 is ROW-grain — a consumer keying on row
    // identity can tell a carried row from an updated one
    val root = ST.mergeTable(spark, sf)
    val feed = runFeed(root).filter(col("_commit_version") === 2)
    val byType = feed.collect().groupBy(_.getAs[String]("_change_type"))
    // updated ids appear as preimage/postimage PAIRS carrying the old
    // and new values (the changeset added 1000 to every %10==0 id in
    // the window)
    val pre = byType("update_preimage")
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("value")).toMap
    val post = byType("update_postimage")
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("value")).toMap
    assert(pre.nonEmpty && pre.keySet == post.keySet)
    assert(pre.keySet.forall(_ % 10 == 0))
    assert(pre.keySet.forall(id => post(id) == pre(id) + 1000.0),
      "postimage must carry the NEW value, preimage the OLD")
    // deletes are exactly the changeset's delete ids; inserts the
    // per-day backfills — not whole-file contents
    val dels = byType("delete").map(_.getAs[Long]("event_id")).toSet
    assert(dels.nonEmpty && dels.forall(_ % 10 == 1), s"deletes: $dels")
    assert(byType("insert").map(_.getAs[Long]("event_id")).toSet ==
      Set(-19745L, -19746L, -19747L))
    // the touchstone the file-grain contract cannot give: a CARRIED row
    // (lives in the rewritten file but was not in the changeset) does
    // not appear in the feed AT ALL
    assert(feed.filter(col("event_id") % 10 === 2).count() == 0,
      "carried rows leaked into the row-grain feed")
    assert(feed.filter(col("event_id") % 10 === 0 &&
      !col("_change_type").startsWith("update_")).count() == 0)
  }

  test("row-grain CDF across CoW DELETE/UPDATE; CDC files follow vacuum's retention") {
    val root = graft.operators.Engine.tmpDir("graft_cdf_rowgrain")
    graft.operators.Engine.listDir(Paths.get(root))
      .foreach(graft.operators.Engine.deleteRecursively)
    val rels = ST.writeDataFiles((1L to 6L).map(k => (k, k * 1.0)).toDF("k", "v")
      .coalesce(1), root, "a").map(ST.footerEntry(root, _, "k"))
    ST.commitEntries(root, 0, rels, 16, Map("statsCol" -> "k", "cdf" -> "row"))
    ST.delete(spark, root, "k <= 2") // v2
    ST.update(spark, root, Seq("v" -> "v * 10"), "k = 5") // v3
    val feed = runFeed(root).collect()
    val v2 = feed.filter(_.getAs[Long]("_commit_version") == 2)
    // ONLY the two deleted rows — the file's 4 survivors don't stream
    assert(v2.map(r => (r.getAs[String]("_change_type"), r.getAs[Long]("k"))).toSet ==
      Set(("delete", 1L), ("delete", 2L)), v2.mkString(","))
    val v3 = feed.filter(_.getAs[Long]("_commit_version") == 3)
    assert(v3.map(r => (r.getAs[String]("_change_type"),
        r.getAs[Long]("k"), r.getAs[Double]("v"))).toSet ==
      Set(("update_preimage", 5L, 5.0), ("update_postimage", 5L, 50.0)),
      v3.mkString(","))
    // CDC files are live exactly as long as their commit's manifest:
    // vacuum keeping v2 preserves v2's file, dropping it reaps it
    def cdcPaths(v: Int): Seq[java.nio.file.Path] =
      ST.manifestMeta(root, v)("cdc").split(';').toSeq
        .flatMap(g => g.split("=", 2)(1).split(',').toSeq)
        .map(rel => Paths.get(root, rel))
    val v2cdc = cdcPaths(2)
    ST.vacuum(root, keepFrom = 2)
    assert(v2cdc.forall(Files.exists(_)),
      "vacuum reaped a retained commit's CDC files")
    assert(runFeed(root, Map("startingVersion" -> "1"))
      .filter(col("_commit_version") === 2).count() == 2,
      "the retained slice of the feed must still serve")
    ST.vacuum(root, keepFrom = 3)
    assert(v2cdc.forall(!Files.exists(_)),
      "a dropped commit's CDC files must be reclaimed")
    assert(cdcPaths(3).forall(Files.exists(_)))
  }

  test("cdcretain: CDC files reclaim on the CDC clock while manifests/time-travel hold (r16)") {
    val root = graft.operators.Engine.tmpDir("graft_cdf_retain")
    graft.operators.Engine.listDir(Paths.get(root))
      .foreach(graft.operators.Engine.deleteRecursively)
    val rels = ST.writeDataFiles((1L to 6L).map(k => (k, k * 1.0)).toDF("k", "v")
      .coalesce(1), root, "a").map(ST.footerEntry(root, _, "k"))
    ST.commitEntries(root, 0, rels, 16, Map("statsCol" -> "k", "cdf" -> "row"))
    ST.delete(spark, root, "k <= 2") // v2: registers row-grain CDC files
    def cdcPaths(v: Int): Seq[java.nio.file.Path] =
      ST.manifestMeta(root, v)("cdc").split(';').toSeq
        .flatMap(g => g.split("=", 2)(1).split(',').toSeq)
        .map(rel => Paths.get(root, rel))
    val v2cdc = cdcPaths(2)
    // the property validates; garbage refuses
    val eBad = intercept[Exception](spark.sql(
      s"ALTER TABLE '$root' SET TBLPROPERTIES ('cdcretain' = 'soon')").collect())
    assert(eBad.getMessage.contains("HOURS"), eBad.getMessage)
    spark.sql(s"ALTER TABLE '$root' SET TBLPROPERTIES ('cdcretain' = '0')").collect()
    // the dry run previews the CDC files as reclaimable even though
    // every manifest is kept (keepFrom = 1 retires nothing)
    val preview = ST.vacuumDryRun(root, keepFrom = 1)
    assert(v2cdc.forall(p =>
        preview.contains(Paths.get(root).toAbsolutePath
          .relativize(p.toAbsolutePath).toString)),
      s"dry run must list the out-of-window CDC files: $preview")
    ST.vacuum(root, keepFrom = 1)
    assert(v2cdc.forall(!Files.exists(_)),
      "cdcretain=0 must reclaim CDC files on the next vacuum")
    // ...while the manifests, data files and time travel all hold
    assert(ST.readAt(spark, root, 1).count() == 6)
    assert(ST.readAt(spark, root, 2).count() == 4)
    assert(ST.read(spark, root).count() == 4)
    // the feed refuses the reclaimed window LOUDLY at planning
    val eFeed = intercept[Exception] {
      val q = spark.readStream.format("graft-snapshot")
        .option("readChangeFeed", "true").option("startingVersion", "1")
        .load(root).writeStream.format("memory")
        .queryName(s"cdf_retain_${System.nanoTime()}").start()
      try q.processAllAvailable() finally q.stop()
    }
    def chain(e: Throwable): String =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(chain(eFeed).contains("reclaimed") &&
      chain(eFeed).contains("cdcretain"), chain(eFeed))
    // batch route refuses identically
    val eBatch = intercept[Exception](spark.read.format("graft-snapshot")
      .option("readChangeFeed", "true").option("afterVersion", "0")
      .load(root).collect())
    assert(chain(eBatch).contains("reclaimed"), chain(eBatch))
    // a LATER DML's fresh CDC files serve normally (the window is per
    // commit clock, not a table-wide kill switch)
    ST.update(spark, root, Seq("v" -> "v + 1"), "k = 5") // v4 (post-flag commits)
    val later = spark.read.format("graft-snapshot")
      .option("readChangeFeed", "true")
      .option("afterVersion", (ST.currentVersion(root) - 1).toString)
      .load(root)
    // cdcretain=0 means even fresh files are outside the window once
    // vacuumed — but UNVACUUMED they still serve (reclaim happens at
    // vacuum time, not read time)
    assert(later.filter(col("_change_type") === "update_postimage").count() == 1)
  }

  test("row-grain CDF: a direct merge() op='u' on an ABSENT key reports insert (ADVICE r13)") {
    import spark.implicits._
    val root = graft.operators.Engine.tmpDir("graft_cdf_uabsent")
    graft.operators.Engine.listDir(Paths.get(root))
      .foreach(graft.operators.Engine.deleteRecursively)
    val rels = ST.writeDataFiles((1L to 4L).map(k => (k, k * 1.0)).toDF("k", "v")
      .coalesce(1), root, "a").map(ST.footerEntry(root, _, "k"))
    ST.commitEntries(root, 0, rels, 16, Map("statsCol" -> "k", "cdf" -> "row"))
    // upsert-style changeset: k=2 exists (true update), k=3 exists and
    // is deleted, k=9 does NOT exist but is labeled 'u' — a
    // row-identity consumer must see INSERT for it, never an unpaired
    // update_postimage
    val ch = Seq((2L, 20.0, "u"), (3L, 0.0, "d"), (9L, 90.0, "u"))
      .toDF("k", "v", "op")
    ST.merge(spark, root, "k", "k", ch)
    val v2 = runFeed(root).filter(col("_commit_version") === 2).collect()
      .map(r => (r.getAs[String]("_change_type"), r.getAs[Long]("k"),
        r.getAs[Double]("v"))).toSet
    assert(v2 == Set(
      ("update_preimage", 2L, 2.0), ("update_postimage", 2L, 20.0),
      ("delete", 3L, 3.0), ("insert", 9L, 90.0)), v2.toString)
    // the table state itself is the same either way (signed-fold
    // equivalence): the classification only fixes the feed's labels
    assert(ST.read(spark, root).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      == Map(1L -> 1.0, 2L -> 20.0, 4L -> 4.0, 9L -> 90.0))
  }

  test("a DSv2 INSERT after a row-CDC commit does not re-emit the DML's change rows (r14 review)") {
    import spark.implicits._
    val w = Files.createTempDirectory("graft_cdf_carry").toString
    spark.conf.set("spark.sql.catalog.gcarry", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcarry.root", w)
    spark.sql("CREATE TABLE gcarry.t (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO gcarry.t VALUES (1, 1.0), (2, 2.0)") // v1
    val root = Paths.get(w, "t").toString
    ST.setTableFlags(root, Map("cdf" -> "row"))                 // v2
    ST.merge(spark, root, "k", "k",
      Seq((1L, 10.0, "u")).toDF("k", "v", "op"))                // v3: cdc meta
    assert(ST.manifestMeta(root, 3).contains("cdc"), "fixture: cdc expected at v3")
    spark.sql("INSERT INTO gcarry.t VALUES (5, 5.0)")           // v4: plain append
    // the append must NOT carry v3's cdc meta — carrying it would make
    // the feed re-emit the merge's images as v4's changes and never
    // surface the appended row
    assert(!ST.manifestMeta(root, 4).contains("cdc"),
      s"append carried the DML's cdc meta: ${ST.manifestMeta(root, 4)}")
    val v4 = runFeed(root).filter(col("_commit_version") === 4).collect()
      .map(r => (r.getAs[String]("_change_type"), r.getAs[Long]("k"))).toSet
    assert(v4 == Set(("insert", 5L)),
      s"v4 must stream exactly the appended row: $v4")
  }

  test("startingVersion 'latest'/'earliest' keywords (Delta parity)") {
    val root = fixture("startkw")
    // latest: nothing historical streams — only future commits would
    assert(runFeed(root, Map("startingVersion" -> "latest")).isEmpty)
    // earliest ≡ the whole-history default, row for row
    assert(runFeed(root, Map("startingVersion" -> "earliest")).count() ==
      runFeed(root).count())
  }

  test("_commit_timestamp rides every CDF row and equals the commit clock (ICT)") {
    val root = fixture("cts")
    val feed = runFeed(root).collect()
    assert(feed.nonEmpty)
    val byV = feed.groupBy(_.getAs[Long]("_commit_version"))
    byV.foreach { case (v, rows) =>
      val expect = ST.commitTimeMillis(root, v.toInt)
      val got = rows.map(_.getAs[java.sql.Timestamp]("_commit_timestamp").getTime)
        .distinct.toSeq
      assert(got == Seq(expect),
        s"v$v _commit_timestamp drifted from the commit clock: $got != $expect")
    }
    // batch CDF carries it identically
    val batch = spark.read.format("graft-snapshot").option("readChangeFeed", "true")
      .load(root).select("_commit_version", "_commit_timestamp").distinct().collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
    assert(batch == (1 to 3).map(v => v.toLong -> ST.commitTimeMillis(root, v)).toMap,
      batch.toString)
  }

  test("startingTimestamp resolves via the commit clock; vacuumed history refuses") {
    val root = fixture("startts")
    // at-or-after semantics: v2's own instant starts the feed AT v2 —
    // row-for-row the startingVersion=1 (exclusive) feed
    val t2 = ST.commitTimeMillis(root, 2)
    val t3 = ST.commitTimeMillis(root, 3)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("_change_type"), r.getAs[Long]("k"),
        r.getAs[Long]("_commit_version"))).sorted.toSeq
    assert(rows(runFeed(root, Map("startingTimestamp" -> t2.toString))) ==
      rows(runFeed(root, Map("startingVersion" -> "1"))),
      "startingTimestamp(t2) must equal the resolved startingVersion feed")
    // an instant after the last commit: nothing historical streams
    assert(runFeed(root, Map("startingTimestamp" -> (t3 + 60000).toString)).isEmpty,
      "future timestamp must start after the current version")
    // both options together are contradictory — refuse
    val eBoth = intercept[Exception](
      runFeed(root, Map("startingTimestamp" -> t2.toString, "startingVersion" -> "1")))
    assert(Iterator.iterate(eBoth: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("mutually exclusive"))))
    // vacuum v1 away: t2 still resolves v2 but v2's PARENT is gone —
    // completeness from the timestamp is unprovable, refuse loudly
    ST.vacuum(root, keepFrom = 2)
    val eVac = intercept[Exception](
      runFeed(root, Map("startingTimestamp" -> t2.toString)))
    assert(Iterator.iterate(eVac: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("vacuumed"))), eVac.getMessage)
    // ...while t3 (parent v2 retained) keeps serving
    assert(runFeed(root, Map("startingTimestamp" -> t3.toString))
      .select("_commit_version").distinct().collect().map(_.getLong(0)).toSet == Set(3L))
  }

  test("skipChangeCommits: rewrites skip whole, appends flow; without it the stream fails loudly") {
    val root = fixture("skipchg") // v1 CTAS, v2 append, v3 CoW delete
    // without the option: the rewrite commit kills the plain stream,
    // naming BOTH escape hatches
    val e = intercept[Exception] {
      val q = spark.readStream.format("graft-snapshot").load(root)
        .writeStream.format("memory")
        .queryName(s"skipchg_fail_${System.nanoTime()}").start()
      try q.processAllAvailable() finally q.stop()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(t => t.getMessage != null &&
      t.getMessage.contains("skipChangeCommits")), e.getMessage)
    // with it: v1+v2 rows stream, v3 (the rewrite) is skipped WHOLE —
    // none of its rewritten-file rows appear — and a later append flows
    def commitRows(base: Int, rows: Seq[(Long, Double)], tag: String): Int = {
      val rels = ST.writeDataFiles(rows.toDF("k", "v").coalesce(1), root, tag)
        .map(ST.footerEntry(root, _, "k"))
      ST.commitEntries(root, base, ST.manifestEntries(root, base) ++ rels, 16,
        ST.carriedMeta(root, base))
    }
    commitRows(3, Seq((100L, 100.0)), "late") // v4 append
    // an INSERT-ONLY merge carries a `merge` audit but removes no files
    // and changes no vector: STRUCTURALLY an append, it must stream —
    // the audit-tag heuristic would silently drop it (review finding)
    ST.merge(spark, root, "k", "k",
      Seq((200L, 200.0, "i")).toDF("k", "v", "op")) // v5
    assert(ST.manifestMeta(root, 5).contains("merge"))
    val name = s"skipchg_ok_${System.nanoTime()}"
    val q = spark.readStream.format("graft-snapshot")
      .option("skipChangeCommits", "true").load(root)
      .writeStream.format("memory").queryName(name).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table(name).collect().map(_.getAs[Long]("k")).sorted.toSeq
    // v1 (1..6) + v2 (7..8) + v4 (100) + v5's insert-only merge (200);
    // v3's rewrite contributes NOTHING
    assert(got == ((1L to 8L) ++ Seq(100L, 200L)), got.toString)
    // the contradictory option pair refuses loudly
    val e2 = intercept[Exception] {
      spark.readStream.format("graft-snapshot")
        .option("readChangeFeed", "true").option("skipChangeCommits", "true")
        .load(root).writeStream.format("memory")
        .queryName(s"${name}_both").start().processAllAvailable()
    }
    assert(chain(e2).exists(t => t.getMessage != null &&
      t.getMessage.contains("mutually")), e2.getMessage)
  }

  test("the feed reads mixed widths: a delete of a pre-evolution narrow file null-fills") {
    val root = graft.operators.Engine.tmpDir("graft_cdf_evolve")
    graft.operators.Engine.listDir(Paths.get(root))
      .foreach(graft.operators.Engine.deleteRecursively)
    // v1: narrow (k, v)
    val narrow = ST.writeDataFiles((1L to 4L).map(k => (k, k * 1.0)).toDF("k", "v")
      .coalesce(1), root, "n").map(ST.footerEntry(root, _, "k"))
    ST.commitEntries(root, 0, narrow, 16, Map("statsCol" -> "k"))
    // v2: widened by a wide-file append (x18's evolution shape)
    val wide = ST.writeDataFiles((5L to 6L).map(k => (k, k * 1.0, k * 0.5))
      .toDF("k", "v", "q").coalesce(1), root, "w").map(ST.footerEntry(root, _, "k"))
    ST.commitEntries(root, 1, ST.manifestEntries(root, 1) ++ wide, 16,
      Map("statsCol" -> "k", "schema" -> "evolved:+q"))
    // v3: CoW delete touching the NARROW file — its rows must stream
    // as deletes with q = null under the union width
    ST.delete(spark, root, "k = 1")
    val feed = runFeed(root)
    val v3del = feed.filter(col("_commit_version") === 3 &&
      col("_change_type") === "delete")
    assert(v3del.count() == 4) // the whole narrow file streams out
    assert(v3del.filter(col("q").isNotNull).count() == 0,
      "pre-evolution rows must null-fill the evolved column")
    val v2ins = feed.filter(col("_commit_version") === 2)
    assert(v2ins.filter(col("q").isNotNull).count() == 2)
  }

  test("maxBytesPerTrigger bounds catch-up batches by DATA SIZE via manifest arithmetic") {
    val root = graft.operators.Engine.tmpDir("graft_maxbytes")
    graft.operators.Engine.listDir(Paths.get(root))
      .foreach(graft.operators.Engine.deleteRecursively)
    def commit(base: Int, ks: Seq[Long], tag: String): Int = {
      val rels = ST.writeDataFiles(ks.map(k => (k, k * 1.0)).toDF("k", "v")
        .coalesce(1), root, tag).map(ST.footerEntry(root, _, "k"))
      val carried = if (base == 0) Map("statsCol" -> "k") else ST.carriedMeta(root, base)
      val prior = if (base == 0) Nil else ST.manifestEntries(root, base)
      ST.commitEntries(root, base, prior ++ rels, shardSize = 16, carried)
    }
    commit(0, 1L to 4L, "a"); commit(1, 5L to 8L, "b")
    commit(2, 9L to 12L, "c"); commit(3, 13L to 16L, "d")
    def newBytes(v: Int): Long = {
      val prev = if (v == 1) Set.empty[String]
        else ST.manifestEntries(root, v - 1).map(_.rel).toSet
      ST.manifestEntries(root, v).filterNot(e => prev(e.rel)).map(_.bytes.get).sum
    }
    def run(opts: (String, String)*): (Long, Int) = {
      val name = s"mb_${System.nanoTime()}"
      val q = opts.foldLeft(spark.readStream.format("graft-snapshot")) {
        case (r, (k, v)) => r.option(k, v)
      }.load(root).writeStream.format("memory").queryName(name).start()
      q.processAllAvailable()
      val batches = q.recentProgress.count(_.numInputRows > 0)
      q.stop()
      (spark.table(name).count(), batches)
    }
    // a budget of exactly two commits' bytes → two commits per batch
    val budget = newBytes(1) + newBytes(2)
    val (rows2, b2) = run("maxBytesPerTrigger" -> budget.toString)
    assert(rows2 == 16, "every row must stream regardless of batching")
    assert(b2 == 2, s"a two-commit budget must yield 2 catch-up batches, got $b2")
    // an oversized commit still admits ALONE — progress is guaranteed
    val (rows1, b1) = run("maxBytesPerTrigger" -> "1")
    assert(rows1 == 16 && b1 == 4,
      s"a 1-byte budget must degrade to one commit per batch, got ($rows1, $b1)")
    // both caps given: the stricter one governs
    val (rowsBoth, bBoth) = run("maxBytesPerTrigger" -> budget.toString,
      "maxVersionsPerTrigger" -> "1")
    assert(rowsBoth == 16 && bBoth == 4,
      s"the version cap must still bound a byte-admitted window, got ($rowsBoth, $bBoth)")
  }

  test("maxBytesPerTrigger on the change feed counts BOTH sides of each commit's diff") {
    val root = fixture("maxbytes")
    def cost(v: Int): Long = {
      val prev = if (v == 1) Map.empty[String, Long]
        else ST.manifestEntries(root, v - 1).map(e => e.rel -> e.bytes.get).toMap
      val next = ST.manifestEntries(root, v).map(e => e.rel -> e.bytes.get).toMap
      (next.keySet -- prev.keySet).toSeq.map(next).sum +
        (prev.keySet -- next.keySet).toSeq.map(prev).sum
    }
    val budget = cost(1) + cost(2) // v3's CoW diff (added + removed) overflows it
    val name = s"cdfmb_${System.nanoTime()}"
    val q = spark.readStream.format("graft-snapshot")
      .option("readChangeFeed", "true")
      .option("maxBytesPerTrigger", budget.toString)
      .load(root).writeStream.format("memory").queryName(name).start()
    q.processAllAvailable()
    val batches = q.recentProgress.count(_.numInputRows > 0)
    q.stop()
    assert(batches == 2,
      s"feed batches must split [v1,v2] | [v3] under the two-commit budget, got $batches")
    // batching must be content-invisible: the bounded feed ≡ the unbounded one
    val bounded = spark.table(name).collect().map(_.toString).sorted.toSeq
    val unbounded = runFeed(root).collect().map(_.toString).sorted.toSeq
    assert(bounded == unbounded, "byte-bounded batching changed the feed content")
  }
}
