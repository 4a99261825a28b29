package graft

import java.nio.file.Paths

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-style maintenance surface over graft-snapshot tables: every
  * verb reaches the same manifest protocol the Scala API drives (the
  * x16/x17/x22 gate fixtures already run OPTIMIZE/MERGE through it;
  * here: VACUUM, defaults, and the parse contract). */
class SnapshotSqlSpec extends AnyFunSuite {
  import TestSession._
  val ST = graft.operators.SnapshotTable
  val Sql = graft.sources.SnapshotSql
  val Engine = graft.operators.Engine

  private def freshTable(name: String): String = {
    val root = Engine.tmpDir(name)
    Engine.listDir(Paths.get(root)).foreach(Engine.deleteRecursively)
    val ev = graft.sources.Tables.events(spark, sf)
      .withColumn("ep_day", expr("(ts div 1000000000) div 86400"))
      .select("event_id", "user_id", "event_type", "value", "ep_day")
      .limit(300)
    val entries = ST.writeDataFiles(ev.repartition(3), root, "base")
      .map(ST.footerEntry(root, _, "ep_day"))
    ST.commitEntries(root, 0, entries, shardSize = 8, Map("statsCol" -> "ep_day"))
    root
  }

  test("OPTIMIZE CLUSTER BY via SQL rewrites the layout and returns the new version") {
    val root = freshTable("graft_sql_opt")
    val rows = ST.read(spark, root).count()
    val v2 = Sql.exec(spark, s"optimize '$root' cluster by (ep_day) target 2")
    assert(v2 == 2 && ST.currentVersion(root) == 2)
    assert(ST.manifestEntries(root, 2).size == 2)
    assert(ST.read(spark, root).count() == rows, "OPTIMIZE changed row count")
    assert(ST.manifestMeta(root, 2).get("statsCol").contains("ep_day"))
  }

  test("MERGE INTO via SQL applies a view-registered changeset") {
    val root = freshTable("graft_sql_merge")
    val victim = ST.read(spark, root).orderBy("event_id").limit(1)
      .withColumn("op", lit("d"))
    victim.createOrReplaceTempView("graft_sql_merge_changes")
    val rows = ST.read(spark, root).count()
    val v2 = Sql.exec(spark,
      s"MERGE INTO '$root' CLUSTER BY (ep_day) ID (event_id) USING graft_sql_merge_changes")
    assert(v2 == 2 && ST.read(spark, root).count() == rows - 1, "delete not applied")
  }

  test("VACUUM via SQL drops retired manifests and unreferenced files") {
    val root = freshTable("graft_sql_vacuum")
    Sql.exec(spark, s"OPTIMIZE '$root' CLUSTER BY (ep_day) TARGET 2")
    val liveRows = ST.read(spark, root).count()
    val v = Sql.exec(spark, s"VACUUM '$root' KEEP FROM 2")
    assert(v == 2)
    // v1's manifest is gone; the current snapshot still reads intact
    assertThrows[Exception](ST.manifestEntries(root, 1))
    assert(ST.read(spark, root).count() == liveRows)
  }

  test("maintenance verbs are real spark.sql statements via the injected parser") {
    val root = freshTable("graft_sql_parser")
    // the injected GraftSqlParser routes owned statements to the
    // snapshot protocol; the command's one-row output is the version
    val out = spark.sql(s"OPTIMIZE '$root' CLUSTER BY (ep_day) TARGET 2").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(2))
    assert(ST.manifestEntries(root, 2).size == 2)
    val victim = ST.read(spark, root).orderBy("event_id").limit(1)
      .withColumn("op", lit("d"))
    victim.createOrReplaceTempView("graft_sql_parser_changes")
    val rows = ST.read(spark, root).count()
    spark.sql(s"MERGE INTO '$root' CLUSTER BY (ep_day) ID (event_id) " +
      "USING graft_sql_parser_changes").collect()
    assert(ST.read(spark, root).count() == rows - 1)
    // un-owned statements fall through to Spark's parser untouched
    assert(spark.sql("SELECT 1 + 1").collect().head.getInt(0) == 2)
    intercept[Exception](spark.sql("DEFINITELY NOT SQL"))
  }

  test("DESCRIBE HISTORY lists versions with file/row counts and metadata") {
    val root = freshTable("graft_sql_history")
    spark.sql(s"OPTIMIZE '$root' CLUSTER BY (ep_day) TARGET 2").collect()
    val h = spark.sql(s"DESCRIBE HISTORY '$root'").collect()
      .map(r => (r.getInt(0), r.getTimestamp(1).getTime,
        r.getLong(2), r.getLong(3), r.getString(4)))
    assert(h.map(_._1).toSeq == Seq(1, 2))
    // the timestamp column IS the TIMESTAMP AS OF clock (ICT-backed),
    // strictly monotone across versions
    assert(h(0)._2 == ST.commitTimeMillis(root, 1) &&
      h(1)._2 == ST.commitTimeMillis(root, 2) && h(0)._2 < h(1)._2,
      s"history timestamps drifted: ${h.map(_._2).toSeq}")
    assert(h(0)._3 == 3 && h(1)._3 == 2, s"file counts wrong: ${h.toSeq}")
    assert(h(0)._4 == h(1)._4 && h(0)._4 == 300, "row counts drifted across the rewrite")
    assert(h(0)._5.contains("statsCol=ep_day"))
    assert(h(1)._5.contains("optimize=clustered:ep_day") && h(1)._5.contains("statsCol=ep_day"))
  }

  test("DESCRIBE FILES lists the pruning planner's per-file inputs") {
    val root = freshTable("graft_sql_files")
    val f = spark.sql(s"DESCRIBE FILES '$root'").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4), r.getLong(5)))
    val entries = ST.manifestEntries(root, ST.currentVersion(root))
    assert(f.length == entries.size && f.length == 3)
    assert(f.map(_._2).sum == 300, s"row counts: ${f.toSeq}")
    // the rows ARE the manifest's planner inputs, column for column
    entries.sortBy(_.rel).zip(f.sortBy(_._1)).foreach { case (e, row) =>
      assert(row._1 == e.rel && row._2 == e.rows &&
        row._4 == "ep_day" && row._5 == e.lo && row._6 == e.hi, s"$e vs $row")
      assert(row._3 == java.nio.file.Files.size(Paths.get(root, e.rel)))
    }
    // an empty (never-committed) table lists zero rows, not an error
    val empty = Engine.tmpDir("graft_sql_files_empty")
    Engine.listDir(Paths.get(empty)).foreach(Engine.deleteRecursively)
    java.nio.file.Files.createDirectories(Paths.get(empty))
    assert(spark.sql(s"DESCRIBE FILES '$empty'").count() == 0)
  }

  test("an unparseable statement fails loudly with the grammar in the message") {
    val e = intercept[IllegalArgumentException](
      Sql.exec(spark, "DROP TABLE students"))
    assert(e.getMessage.contains("OPTIMIZE") && e.getMessage.contains("MERGE INTO"))
  }

  test("UPDATE via spark.sql: copy-on-write, pruned rewrite, pre-update RHS semantics") {
    val root = freshTable("graft_sql_update")
    spark.sql(s"OPTIMIZE '$root' CLUSTER BY (ep_day) TARGET 3").collect()
    val before = ST.read(spark, root)
      .select("event_id", "event_type", "value").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    val nFiles = ST.manifestEntries(root, ST.currentVersion(root)).size
    // a day-range predicate against the day-clustered layout: the
    // find-touched-files scan confines the rewrite to matching files
    val loDay = ST.read(spark, root).agg(min(col("ep_day"))).head().getLong(0)
    val out = spark.sql(s"UPDATE '$root' SET value = value * 3, " +
      s"event_type = 'x' WHERE ep_day = $loDay AND value > 0.0").collect()
    val v = out.head.getInt(0)
    val meta = ST.manifestMeta(root, v)
    val Array(n, m) = meta("update").stripPrefix("cow:").split("of").map(_.toInt)
    assert(m == nFiles && n < m, s"UPDATE rewrote the whole table: ${meta("update")}")
    // row semantics: RHS evaluated on the PRE-update row; others untouched
    val after = ST.read(spark, root)
      .select("event_id", "event_type", "value", "ep_day").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    after.foreach { case (id, et, value, day) =>
      val (et0, v0) = before(id)
      if (day == loDay && v0 > 0.0)
        assert(et == "x" && value == v0 * 3, s"row $id not updated: ($et, $value)")
      else
        assert(et == et0 && value == v0, s"row $id leaked an update: ($et, $value)")
    }
    // a zero-match UPDATE is a version no-op (Delta's contract)
    val v2 = Sql.exec(spark, s"UPDATE '$root' SET value = 0.0 WHERE ep_day = -1")
    assert(v2 == v && ST.currentVersion(root) == v, "no-op UPDATE minted a version")
    // SET on an unknown column is refused before any write
    val e = intercept[IllegalArgumentException](
      Sql.exec(spark, s"UPDATE '$root' SET nope = 1 WHERE ep_day = $loDay"))
    assert(e.getMessage.contains("unknown column"))
  }

  test("UPDATE on an EVOLVED table keeps evolved-column values on mixed widths") {
    import spark.implicits._
    val root = Engine.tmpDir("graft_sql_upd_evolved")
    Engine.listDir(java.nio.file.Paths.get(root)).foreach(Engine.deleteRecursively)
    // 4 range-disjoint narrow files (id, v)
    val base = (1L to 40L).map(k => (k, 1.0 * k)).toDF("id", "v")
      .repartitionByRange(4, col("id"))
    assert(graft.streaming.SnapshotSink.appendBatch(root, base, 0L, keyCol = "id"))
    // widen keys 31..40 with `score` (partial merge → mixed widths + capture)
    val w = (31L to 40L).map(k => (k, 2.0 * k, 0.25 * k)).toDF("id", "v", "score")
      .withColumn("op", lit("u"))
    ST.merge(spark, root, "id", "id", w)
    assert(ST.manifestMeta(root, ST.currentVersion(root)).contains("schema"))
    // UPDATE touches a narrow-file range AND a wide-file range: the
    // rewrite reads through the union schema, so wide rows must keep
    // their score and narrow rows must keep surfacing null
    spark.sql(s"UPDATE '$root' SET v = v + 100.0 WHERE id IN (5, 35)").collect()
    val rows = ST.read(spark, root).select("id", "v", "score").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
      .toMap
    assert(rows(5L) == ((105.0, None)), s"narrow-file update wrong: ${rows(5L)}")
    assert(rows(35L) == ((170.0, Some(8.75))), s"wide row lost its evolved value: ${rows(35L)}")
    assert(rows(20L) == ((20.0, None)) && rows(40L) == ((80.0, Some(10.0))),
      "untouched rows drifted")
    // predicate matching every file → uniform union-width files: the
    // evolution markers are dropped, and every value survives
    spark.sql(s"UPDATE '$root' SET v = v * 1.0 WHERE id >= 1").collect()
    val meta = ST.manifestMeta(root, ST.currentVersion(root))
    assert(!meta.contains("schema") && !meta.contains("schemaJson"),
      s"full-rewrite UPDATE left stale evolution markers: $meta")
    val after = ST.read(spark, root).select("id", "score").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(after(35L) == Some(8.75) && after(5L).isEmpty,
      "full-rewrite UPDATE corrupted evolved values")
  }

  test("UPDATE path and catalog-name routes address the same table; foreign refs fall through") {
    val w = Engine.tmpDir("graft_sql_upd_cat")
    Engine.listDir(Paths.get(w)).foreach(Engine.deleteRecursively)
    spark.conf.set("spark.sql.catalog.gu", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gu.root", w)
    graft.sources.Tables.orders(spark, sf).limit(100)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .createOrReplaceTempView("graft_upd_src")
    spark.sql("CREATE TABLE gu.upd_t AS SELECT * FROM graft_upd_src")
    spark.sql("UPDATE gu.upd_t SET o_totalprice = o_totalprice + 1.0 " +
      "WHERE o_orderkey % 2 = 0").collect()
    // the name route committed through the SAME manifest the path route reads
    val byPath = ST.read(spark, s"$w/upd_t")
    val bumped = byPath.filter(expr("o_orderkey % 2 = 0")).count()
    assert(bumped > 0 && ST.manifestMeta(s"$w/upd_t",
      ST.currentVersion(s"$w/upd_t")).contains("update"))
    // an UPDATE naming a non-graft table is NOT claimed: it reaches
    // Spark's own parser/analyzer (which rejects it as an unknown table
    // rather than our grammar error)
    val e = intercept[Exception](spark.sql("UPDATE some_db.some_t SET a = 1 WHERE b = 2"))
    assert(!e.getMessage.contains("graft-snapshot SQL"),
      s"foreign UPDATE was claimed by the graft parser: ${e.getMessage}")
  }

  test("DELETE via spark.sql: copy-on-write, pruned rewrite, NULL predicate keeps rows") {
    val root = freshTable("graft_sql_delete")
    spark.sql(s"OPTIMIZE '$root' CLUSTER BY (ep_day) TARGET 3").collect()
    val before = ST.read(spark, root).select("event_id", "ep_day", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val nFiles = ST.manifestEntries(root, ST.currentVersion(root)).size
    // a day-range predicate against the day-clustered layout: the
    // find-touched scan confines the rewrite to files holding matches
    val loDay = before.map(_._2).min
    val doomed = before.filter { case (_, d, v) => d == loDay && v > 0.0 }.map(_._1).toSet
    assert(doomed.nonEmpty, "fixture has no matching rows")
    val out = spark.sql(s"DELETE FROM '$root' " +
      s"WHERE ep_day = $loDay AND value > 0.0").collect()
    val v = out.head.getInt(0)
    val meta = ST.manifestMeta(root, v)
    val Array(n, m) = meta("delete").stripPrefix("cow:").split("of").map(_.toInt)
    assert(m == nFiles && n < m, s"DELETE rewrote the whole table: ${meta("delete")}")
    // exactly the WHERE=TRUE rows are gone; everything else intact
    val after = ST.read(spark, root).select("event_id").collect().map(_.getLong(0)).toSet
    assert(after == before.map(_._1).toSet -- doomed,
      s"DELETE removed the wrong rows (want ${doomed.size} gone)")
    // a zero-match DELETE is a version no-op (Delta's contract)
    val v2 = Sql.exec(spark, s"DELETE FROM '$root' WHERE ep_day = -1")
    assert(v2 == v && ST.currentVersion(root) == v, "no-op DELETE minted a version")
    // a NULL predicate keeps the row: DELETE removes WHERE=TRUE only.
    // value IS NULL rows don't exist in this fixture, so null out a
    // column via UPDATE first, then delete on a comparison against it
    Sql.exec(spark, s"UPDATE '$root' SET value = CAST(NULL AS DOUBLE) " +
      s"WHERE event_id = ${after.head}")
    val total = ST.read(spark, root).count()
    Sql.exec(spark, s"DELETE FROM '$root' WHERE value > ${Double.MinValue}")
    val kept = ST.read(spark, root).select("event_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(after.head),
      s"NULL-predicate row must survive a DELETE (kept $kept of $total)")
    // the name-addressed spelling is NOT claimed by the parser: it
    // reaches Spark's analyzer (unknown-table error, not our grammar)
    val e = intercept[Exception](spark.sql("DELETE FROM some_db.some_t WHERE a = 1"))
    assert(!e.getMessage.contains("graft-snapshot SQL"),
      s"foreign DELETE was claimed by the graft parser: ${e.getMessage}")
  }

  test("the change feed across a DELETE commit is exactly the deleted rows") {
    val root = freshTable("graft_sql_del_cdf")
    spark.sql(s"OPTIMIZE '$root' CLUSTER BY (ep_day) TARGET 3").collect()
    val v0 = ST.currentVersion(root)
    val loDay = ST.read(spark, root).agg(min(col("ep_day"))).head().getLong(0)
    val doomed = ST.read(spark, root)
      .filter(col("ep_day") === loDay && col("value") > 0.0)
      .select("event_id").collect().map(_.getLong(0)).toSet
    spark.sql(s"DELETE FROM '$root' WHERE ep_day = $loDay AND value > 0.0").collect()
    val v1 = ST.currentVersion(root)
    // copy-on-write carried rows cancel in the multiset diff: the feed
    // is the doomed rows as 'delete', zero 'insert' — an incremental
    // consumer (index/aggregate maintenance) applies ONE commit's
    // semantic delta, never a rewrite-sized echo
    val feed = ST.changesBetween(spark, root, v0, v1)
      .select("change_type", "event_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(feed.forall(_._1 == "delete"), s"CoW echo in the change feed: ${feed.take(5).toSeq}")
    assert(feed.map(_._2).toSet == doomed && feed.length == doomed.size,
      s"feed must be exactly the deleted rows (${feed.length} vs ${doomed.size})")
  }

  test("DELETE on an EVOLVED table: mixed-width rewrite keeps values; full rewrite drops markers") {
    import spark.implicits._
    val root = Engine.tmpDir("graft_sql_del_evolved")
    Engine.listDir(java.nio.file.Paths.get(root)).foreach(Engine.deleteRecursively)
    val base = (1L to 40L).map(k => (k, 1.0 * k)).toDF("id", "v")
      .repartitionByRange(4, col("id"))
    assert(graft.streaming.SnapshotSink.appendBatch(root, base, 0L, keyCol = "id"))
    val w = (31L to 40L).map(k => (k, 2.0 * k, 0.25 * k)).toDF("id", "v", "score")
      .withColumn("op", lit("u"))
    ST.merge(spark, root, "id", "id", w)
    assert(ST.manifestMeta(root, ST.currentVersion(root)).contains("schema"))
    // touch a narrow file and the wide file in one DELETE: the rewrite
    // reads through the union schema, so surviving wide rows keep score
    spark.sql(s"DELETE FROM '$root' WHERE id IN (5, 35)").collect()
    val rows = ST.read(spark, root).select("id", "score").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(!rows.contains(5L) && !rows.contains(35L), "DELETE left doomed rows")
    assert(rows(40L) == Some(10.0) && rows(20L).isEmpty,
      s"evolved column lost in DELETE rewrite: ${rows.get(40L)}")
    // predicate matching every file → uniform union-width survivors:
    // the evolution markers are dropped (same contract as merge/update)
    spark.sql(s"DELETE FROM '$root' WHERE id % 2 = 0").collect()
    val meta = ST.manifestMeta(root, ST.currentVersion(root))
    assert(!meta.contains("schema") && !meta.contains("schemaJson"),
      s"full-rewrite DELETE left stale evolution markers: $meta")
    val after = ST.read(spark, root).select("id", "score").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(after(39L) == Some(9.75) && after(19L).isEmpty,
      "full-rewrite DELETE corrupted evolved values")
  }

  test("DESCRIBE DETAIL summarizes the current snapshot from the manifest alone") {
    val root = freshTable("graft_sql_detail")
    val row = spark.sql(s"DESCRIBE DETAIL '$root'").head()
    assert(row.getAs[String]("location") == root)
    assert(row.getAs[Int]("version") == 1)
    assert(row.getAs[Long]("num_files") == 3)
    assert(row.getAs[Long]("num_rows") == ST.read(spark, root).count())
    assert(row.getAs[Long]("size_bytes") > 0)
    assert(row.getAs[String]("meta").contains("statsCol=ep_day"))
    // a foreign reference falls through to Spark's parser (DESCRIBE is
    // real Spark syntax)
    val e = intercept[Exception](spark.sql("DESCRIBE DETAIL nosuch.tbl").collect())
    assert(!e.getMessage.contains("graft-snapshot SQL"), e.getMessage)
  }

  test("ANSI MERGE: update/delete/insert clauses compile to one pruned changeset merge") {
    import spark.implicits._
    val root = Engine.tmpDir("graft_sql_ansimerge")
    Engine.listDir(Paths.get(root)).foreach(Engine.deleteRecursively)
    // two key-clustered files so the merge's pruning is observable
    val entries = (ST.writeDataFiles((1L to 5L).map(k => (k, k * 10.0)).toDF("k", "v")
        .coalesce(1), root, "lo") ++
      ST.writeDataFiles((6L to 10L).map(k => (k, k * 10.0)).toDF("k", "v")
        .coalesce(1), root, "hi")).map(ST.footerEntry(root, _, "k"))
    ST.commitEntries(root, 0, entries, shardSize = 8, Map("statsCol" -> "k"))
    // source: k=2 update (+1), k=4 delete (delta<0), k=0 insert — the
    // changeset's key bounds [0,4] miss the hi file [6,10], so merge's
    // stats pruning carries it (an out-of-range insert key would widen
    // the bound and defeat the pruning — inherent to range pruning)
    Seq((2L, 1.0), (4L, -1.0), (0L, 5.0)).toDF("k", "delta")
      .withColumn("v", lit(0.0)) // INSERT * needs every target column
      .createOrReplaceTempView("am_src")
    val v = spark.sql(s"""MERGE INTO '$root' AS t USING am_src AS s ON t.k = s.k
      WHEN MATCHED AND s.delta >= 0 THEN UPDATE SET v = t.v + s.delta
      WHEN MATCHED THEN DELETE
      WHEN NOT MATCHED THEN INSERT *""").head().getInt(0)
    assert(v == 2)
    val got = ST.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(2L) == 21.0, s"UPDATE SET t.v + s.delta wrong: ${got.get(2L)}")
    assert(!got.contains(4L), "fall-through DELETE clause missed")
    assert(got(0L) == 0.0, "INSERT * missed")
    assert(got(7L) == 70.0 && got.size == 10)
    // the rewrite was pruned: only the lo file rewritten, hi carried
    assert(ST.manifestMeta(root, 2)("merge") == "cow:k:1of2",
      s"audit: ${ST.manifestMeta(root, 2)}")
    // clause precedence is written order: k=2 satisfied UPDATE's
    // condition, so DELETE (condition-free) never saw it — and a source
    // row matching NO clause's condition... (delta<0 hits DELETE here,
    // proving fall-through, asserted above via k=4)
  }

  test("ANSI MERGE refusals: ambiguous matches, missing INSERT columns, foreign refs") {
    import spark.implicits._
    val root = Engine.tmpDir("graft_sql_ansimerge_ref")
    Engine.listDir(Paths.get(root)).foreach(Engine.deleteRecursively)
    ST.commitEntries(root, 0,
      ST.writeDataFiles((1L to 3L).map(k => (k, k * 1.0)).toDF("k", "v")
        .coalesce(1), root, "a").map(ST.footerEntry(root, _, "k")),
      shardSize = 8, Map("statsCol" -> "k"))
    // two source rows hit target k=1: ANSI nondeterminism → loud error
    Seq((1L, 1.0, 5.0), (1L, 2.0, 5.0)).toDF("k", "delta", "v")
      .createOrReplaceTempView("am_dup")
    val e1 = intercept[Exception](spark.sql(
      s"""MERGE INTO '$root' AS t USING am_dup AS s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.delta""").collect())
    assert(e1.getMessage.contains("multiple source rows"), e1.getMessage)
    // INSERT * with a source lacking a target column refuses
    Seq((9L, 1.0)).toDF("k", "delta").createOrReplaceTempView("am_narrow")
    val e2 = intercept[Exception](spark.sql(
      s"""MERGE INTO '$root' AS t USING am_narrow AS s ON t.k = s.k
        WHEN NOT MATCHED THEN INSERT *""").collect())
    assert(e2.getMessage.contains("INSERT *"), e2.getMessage)
    // a source matching NOTHING with matched-only clauses is a version
    // no-op (the table was never touched)
    Seq((77L, 1.0, 0.0)).toDF("k", "delta", "v").createOrReplaceTempView("am_miss")
    val v = spark.sql(s"""MERGE INTO '$root' AS t USING am_miss AS s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.delta""").head().getInt(0)
    assert(v == 1 && ST.currentVersion(root) == 1, "no-op merge minted a version")
    // an ANSI MERGE on a non-graft identifier falls through to Spark's
    // parser/analyzer instead of being claimed here
    val e3 = intercept[Exception](spark.sql(
      """MERGE INTO nosuch.tbl AS t USING am_miss AS s ON t.k = s.k
        WHEN MATCHED THEN DELETE""").collect())
    assert(!e3.getMessage.contains("graft-snapshot SQL"), e3.getMessage)
    // SET may not re-key a row through the ON column: the keyed merge
    // would delete whatever row holds the NEW key — refused loudly
    val e4 = intercept[Exception](spark.sql(
      s"""MERGE INTO '$root' AS t USING am_miss AS s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET k = 99""").collect())
    assert(e4.getMessage.contains("may not assign the ON column"), e4.getMessage)
    // SET may not re-cluster a row through the table's statsCol either
    // (ADVICE r12): merge prunes rewritten files from the changeset's
    // clusterCol bounds, and an updated row carries only the NEW
    // cluster value — the file holding the OLD value would never be
    // rewritten, leaving the stale row alive (silent key duplication)
    val ccRoot = Engine.tmpDir("graft_sql_ansimerge_cc")
    Engine.listDir(Paths.get(ccRoot)).foreach(Engine.deleteRecursively)
    ST.commitEntries(ccRoot, 0,
      ST.writeDataFiles(Seq((1L, 10L, 1.0), (2L, 20L, 2.0)).toDF("k", "d", "v")
        .coalesce(1), ccRoot, "a").map(ST.footerEntry(ccRoot, _, "d")),
      shardSize = 8, Map("statsCol" -> "d"))
    Seq((1L, 0.0, 0L)).toDF("k", "delta", "d").withColumn("v", lit(0.0))
      .createOrReplaceTempView("am_cc")
    val e4b = intercept[Exception](spark.sql(
      s"""MERGE INTO '$ccRoot' AS t USING am_cc AS s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET d = t.d + 30""").collect())
    assert(e4b.getMessage.contains("may not assign the cluster column d"),
      e4b.getMessage)
    // ...while SET on a plain value column of the same table still works
    spark.sql(s"""MERGE INTO '$ccRoot' AS t USING am_cc AS s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = t.v + 100""").collect()
    val ccGot = ST.read(spark, ccRoot).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(ccGot(1L) == 101.0 && ccGot(2L) == 2.0 && ccGot.size == 2, ccGot.toString)
    // duplicate keys in the TARGET are refused when a matched clause
    // exists (the keyed merge would collapse them) — but an insert-only
    // merge over the same table is fine (no matched row is touched)
    import graft.operators.{SnapshotTable => STx}
    val dupRoot = Engine.tmpDir("graft_sql_ansimerge_dup")
    Engine.listDir(Paths.get(dupRoot)).foreach(Engine.deleteRecursively)
    STx.commitEntries(dupRoot, 0,
      STx.writeDataFiles(Seq((1L, 1.0), (1L, 2.0), (3L, 3.0)).toDF("k", "v")
        .coalesce(1), dupRoot, "a").map(STx.footerEntry(dupRoot, _, "k")),
      shardSize = 8, Map("statsCol" -> "k"))
    Seq((1L, 9.0, 0.0)).toDF("k", "delta", "v").createOrReplaceTempView("am_one")
    val e5 = intercept[Exception](spark.sql(
      s"""MERGE INTO '$dupRoot' AS t USING am_one AS s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.delta""").collect())
    assert(e5.getMessage.contains("duplicated in the TARGET"), e5.getMessage)
    Seq((7L, 0.0, 7.5)).toDF("k", "delta", "v").createOrReplaceTempView("am_ins")
    spark.sql(s"""MERGE INTO '$dupRoot' AS t USING am_ins AS s ON t.k = s.k
      WHEN NOT MATCHED THEN INSERT *""").collect()
    assert(ST.read(spark, dupRoot).count() == 4,
      "insert-only merge over a dup-key target must succeed")
  }

  test("MERGE WITH SCHEMA EVOLUTION widens from the source; the plain spelling refuses SET on the novel column") {
    import spark.implicits._
    val root = Engine.tmpDir("graft_sql_merge_evo")
    Engine.listDir(Paths.get(root)).foreach(Engine.deleteRecursively)
    // two key-clustered files so the untouched one proves byte-stability
    val entries = (ST.writeDataFiles((1L to 5L).map(k => (k, k * 10.0)).toDF("k", "v")
        .coalesce(1), root, "lo") ++
      ST.writeDataFiles((6L to 10L).map(k => (k, k * 10.0)).toDF("k", "v")
        .coalesce(1), root, "hi")).map(ST.footerEntry(root, _, "k"))
    ST.commitEntries(root, 0, entries, shardSize = 8, Map("statsCol" -> "k"))
    val hiBytes = java.nio.file.Files.size(Paths.get(root, entries(1).rel))
    // source carries a NOVEL column `tag` plus an update and an insert
    Seq((2L, 25.0, "upd"), (0L, 5.0, "new")).toDF("k", "v", "tag")
      .createOrReplaceTempView("evo_src")
    // 1. plain spelling: SET on the novel column refuses, naming the fix
    val e1 = intercept[Exception](spark.sql(
      s"""MERGE INTO '$root' AS t USING evo_src AS s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v, tag = s.tag
        WHEN NOT MATCHED THEN INSERT *""").collect())
    assert(e1.getMessage.contains("unknown target column tag") &&
      e1.getMessage.contains("SCHEMA EVOLUTION"), e1.getMessage)
    assert(ST.currentVersion(root) == 1, "refused merge must not commit")
    // 2. the evolution spelling widens: matched row takes the SET value,
    // the insert lands it, every pre-existing row surfaces NULL history
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO '$root' AS t USING evo_src AS s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v, tag = s.tag
        WHEN NOT MATCHED THEN INSERT *""").collect()
    val got = ST.read(spark, root).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), Option(r.getAs[String]("tag")))).toMap
    assert(got.size == 11)
    assert(got(2L) == ((25.0, Some("upd"))), got(2L).toString)
    assert(got(0L) == ((5.0, Some("new"))), got(0L).toString)
    assert(got(7L) == ((70.0, None)), "untouched rows must surface NULL history")
    // the evolution commit captured the union and marked the version
    val meta = ST.manifestMeta(root, ST.currentVersion(root))
    assert(meta.get("schema").exists(_.contains("tag")), meta.get("schema").toString)
    assert(meta.get("schemaJson").exists(_.contains("tag")), "union capture missing")
    // pruning held: the hi file [6,10] carried by reference, byte-identical
    assert(meta("merge") == "cow:k:1of2", meta("merge"))
    assert(java.nio.file.Files.size(Paths.get(root, entries(1).rel)) == hiBytes)
    // 3. a second evolved merge against the widened table is a PLAIN
    // merge (tag is a table column now — no second evolution)
    Seq((3L, 35.0, "upd2")).toDF("k", "v", "tag").createOrReplaceTempView("evo_src2")
    spark.sql(
      s"""MERGE INTO '$root' AS t USING evo_src2 AS s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v, tag = s.tag""").collect()
    val got2 = ST.read(spark, root).collect()
      .map(r => r.getLong(0) -> Option(r.getAs[String]("tag"))).toMap
    assert(got2(3L).contains("upd2") && got2(7L).isEmpty)
    // 4. SET-only evolution (no INSERT clause): only the SET-named
    // column widens, and rows outside the clause keep NULL
    val root2 = Engine.tmpDir("graft_sql_merge_evo2")
    Engine.listDir(Paths.get(root2)).foreach(Engine.deleteRecursively)
    ST.commitEntries(root2, 0,
      ST.writeDataFiles((1L to 4L).map(k => (k, k * 1.0)).toDF("k", "v")
        .coalesce(1), root2, "a").map(ST.footerEntry(root2, _, "k")),
      shardSize = 8, Map("statsCol" -> "k"))
    Seq((2L, 9.0, 7L, "zz")).toDF("k", "v", "w", "helper")
      .createOrReplaceTempView("evo_src3")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO '$root2' AS t USING evo_src3 AS s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET w = s.w""").collect()
    val cols2 = ST.read(spark, root2).columns.toSeq
    assert(cols2.contains("w") && !cols2.contains("helper"),
      s"only SET-named novel columns may widen: $cols2")
    val w2 = ST.read(spark, root2).filter(col("k") === 2).select("w").head().getLong(0)
    assert(w2 == 7L)
    // 5. a SET spelling the novel column with DIFFERENT CASE than the
    // source canonicalizes to the source spelling — one column, the
    // SET value applied (pre-r16 this passed the filter then died on a
    // case-sensitive schema lookup, or silently nulled the value)
    val root3 = Engine.tmpDir("graft_sql_merge_evo3")
    Engine.listDir(Paths.get(root3)).foreach(Engine.deleteRecursively)
    ST.commitEntries(root3, 0,
      ST.writeDataFiles((1L to 4L).map(k => (k, k * 1.0)).toDF("k", "v")
        .coalesce(1), root3, "a").map(ST.footerEntry(root3, _, "k")),
      shardSize = 8, Map("statsCol" -> "k"))
    Seq((3L, 9.0, 42L)).toDF("k", "v", "score").createOrReplaceTempView("evo_src4")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO '$root3' AS t USING evo_src4 AS s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET SCORE = s.score""").collect()
    val cols3 = ST.read(spark, root3).columns.toSeq
    assert(cols3.count(_.equalsIgnoreCase("score")) == 1 && cols3.contains("score"),
      s"case-variant SET must canonicalize to ONE source-spelled column: $cols3")
    val s3 = ST.read(spark, root3).filter(col("k") === 3)
      .select("score").head().getLong(0)
    assert(s3 == 42L, s"the case-variant SET's value must land, got $s3")
    assert(ST.read(spark, root3).filter(col("k") === 1)
      .select("score").head().isNullAt(0), "history must stay NULL")
  }

  test("MERGE NOT MATCHED BY SOURCE: precedence, pruning, and the sync end state") {
    import spark.implicits._
    val root = Engine.tmpDir("graft_sql_nmbs")
    Engine.listDir(Paths.get(root)).foreach(Engine.deleteRecursively)
    // two key-clustered files; the sync window covers only the lo file
    val entries = (ST.writeDataFiles((1L to 6L).map(k => (k, s"t$k", k * 10.0))
        .toDF("k", "tag", "v").coalesce(1), root, "lo") ++
      ST.writeDataFiles((7L to 12L).map(k => (k, s"t$k", k * 10.0))
        .toDF("k", "tag", "v").coalesce(1), root, "hi"))
      .map(ST.footerEntry(root, _, "k"))
    ST.commitEntries(root, 0, entries, shardSize = 8, Map("statsCol" -> "k"))
    // source re-snapshot of keys 1..6: k=2 kept+revalued, k=4 kept
    // as-is, k=13 new; 1,3,5,6 absent → BY SOURCE candidates
    Seq((2L, "s2", 99.0), (4L, "s4", 40.0), (13L, "s13", 130.0))
      .toDF("k", "tag", "v").createOrReplaceTempView("nmbs_src")
    val v = spark.sql(s"""MERGE INTO '$root' AS t USING nmbs_src AS s ON t.k = s.k
      WHEN MATCHED AND s.v <> t.v THEN UPDATE SET v = s.v
      WHEN NOT MATCHED BY SOURCE AND t.k <= 6 AND t.k % 2 = 1 THEN DELETE
      WHEN NOT MATCHED BY SOURCE AND t.k <= 6 THEN UPDATE SET tag = 'stale'
      WHEN NOT MATCHED BY TARGET THEN INSERT *""").head().getInt(0)
    assert(v == 2)
    val got = ST.read(spark, root).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(got(2L) == (("t2", 99.0)), "MATCHED conditional UPDATE missed")
    assert(got(4L) == (("t4", 40.0)), "MATCHED row failing the condition must carry")
    assert(!got.contains(1L) && !got.contains(3L) && !got.contains(5L),
      "BY SOURCE DELETE (odd unmatched keys in window) missed")
    assert(got(6L) == (("stale", 60.0)),
      "BY SOURCE fall-through UPDATE (even unmatched) missed")
    assert(got(13L) == (("s13", 130.0)), "INSERT * (BY TARGET spelling) missed")
    // rows OUTSIDE the sync window are unmatched-by-source too, but the
    // clause conditions bound them out — carried untouched
    (7L to 12L).foreach(k => assert(got(k) == ((s"t$k", k * 10.0)),
      s"out-of-window row $k was touched by an unbounded sync"))
    assert(got.size == 10) // 12 - 3 deleted + 1 inserted
    // and the rewrite was PRUNED to the window's file: the changeset's
    // key bounds [1,13]... include the insert, so here both files fall
    // in range — rerun a window-only sync on the fresh state to see
    // confinement (no insert, all changeset keys <= 6)
    Seq.empty[(Long, String, Double)].toDF("k", "tag", "v")
      .createOrReplaceTempView("nmbs_empty")
    spark.sql(s"""MERGE INTO '$root' AS t USING nmbs_empty AS s ON t.k = s.k
      WHEN NOT MATCHED BY SOURCE AND t.k <= 6 THEN UPDATE SET tag = 'resync'""")
      .collect()
    val audit = ST.manifestMeta(root, 3)("merge")
    assert(audit.startsWith("cow:k:") && audit.endsWith("of2"), audit)
    assert(audit == "cow:k:1of2", s"window-bounded sync must rewrite 1 of 2 files: $audit")
    val after = ST.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after(2L) == "resync" && after(6L) == "resync" && after(8L) == "t8")
  }

  test("MERGE NOT MATCHED BY SOURCE refusals: dup unmatched keys, source refs, cluster SET") {
    import spark.implicits._
    val root = Engine.tmpDir("graft_sql_nmbs_ref")
    Engine.listDir(Paths.get(root)).foreach(Engine.deleteRecursively)
    // k=1 duplicated in the target and absent from the source
    ST.commitEntries(root, 0,
      ST.writeDataFiles(Seq((1L, 1.0), (1L, 2.0), (2L, 3.0)).toDF("k", "v")
        .coalesce(1), root, "a").map(ST.footerEntry(root, _, "k")),
      shardSize = 8, Map("statsCol" -> "k"))
    Seq((2L, 9.0)).toDF("k", "v").createOrReplaceTempView("nmbsr_src")
    val e1 = intercept[Exception](spark.sql(
      s"""MERGE INTO '$root' AS t USING nmbsr_src AS s ON t.k = s.k
        WHEN NOT MATCHED BY SOURCE THEN DELETE""").collect())
    assert(e1.getMessage.contains("NOT MATCHED BY SOURCE"), e1.getMessage)
    // ...but a matched-only merge over the same table still refuses on
    // its own check only if the dup key IS matched — here k=1 is not,
    // so matched UPDATE of k=2 succeeds
    spark.sql(s"""MERGE INTO '$root' AS t USING nmbsr_src AS s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v""").collect()
    assert(ST.read(spark, root).filter(col("k") === 2).head().getDouble(1) == 9.0)
    // an `s.` reference in a BY SOURCE clause has no row to bind — loud
    val dedup = Engine.tmpDir("graft_sql_nmbs_ref2")
    Engine.listDir(Paths.get(dedup)).foreach(Engine.deleteRecursively)
    ST.commitEntries(dedup, 0,
      ST.writeDataFiles(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
        .coalesce(1), dedup, "a").map(ST.footerEntry(dedup, _, "k")),
      shardSize = 8, Map("statsCol" -> "k"))
    val e2 = intercept[Exception](spark.sql(
      s"""MERGE INTO '$dedup' AS t USING nmbsr_src AS s ON t.k = s.k
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = s.v + 1""").collect())
    assert(!e2.getMessage.contains("cannot parse"),
      s"s.-ref must fail analysis, not parsing: ${e2.getMessage}")
    // SET refusals apply to the BY SOURCE update too (same re-key and
    // re-cluster hazards as the matched clause)
    val e3 = intercept[Exception](spark.sql(
      s"""MERGE INTO '$dedup' AS t USING nmbsr_src AS s ON t.k = s.k
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET k = 99""").collect())
    assert(e3.getMessage.contains("may not assign the ON column"), e3.getMessage)
  }

  test("MERGE NOT MATCHED BY SOURCE refuses a NULL-keyed target row (ADVICE r13)") {
    import spark.implicits._
    val root = Engine.tmpDir("graft_sql_nmbs_null")
    Engine.listDir(Paths.get(root)).foreach(Engine.deleteRecursively)
    // one NULL ON-key row: it always lands in the anti set, but the
    // keyed rewrite can't address it (non-null-safe equality on the
    // id) — a BY SOURCE DELETE would leave it in place, a BY SOURCE
    // UPDATE would duplicate it
    ST.commitEntries(root, 0,
      ST.writeDataFiles(Seq((Some(1L), 1.0), (None, 2.0), (Some(3L), 3.0))
        .toDF("k", "v").coalesce(1), root, "a").map(ST.footerEntry(root, _, "k")),
      shardSize = 8, Map("statsCol" -> "k"))
    Seq((1L, 9.0)).toDF("k", "v").createOrReplaceTempView("nmbs_null_src")
    val e = intercept[Exception](spark.sql(
      s"""MERGE INTO '$root' AS t USING nmbs_null_src AS s ON t.k = s.k
        WHEN NOT MATCHED BY SOURCE THEN DELETE""").collect())
    assert(e.getMessage.contains("NULL ON key"), e.getMessage)
    // matched-only merges stay fine: inner joins never see the NULL row
    spark.sql(s"""MERGE INTO '$root' AS t USING nmbs_null_src AS s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v""").collect()
    val got = ST.read(spark, root).collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getDouble(1)).toMap
    assert(got(1L) == 9.0 && got(-1L) == 2.0 && got.size == 3, got.toString)
  }

  test("VACUUM RETAIN n HOURS resolves against IN-COMMIT timestamps; window versions survive") {
    import spark.implicits._
    val root = Engine.tmpDir("graft_sql_vac_retain")
    Engine.listDir(Paths.get(root)).foreach(Engine.deleteRecursively)
    def commitRows(base: Int, ks: Seq[Long], tag: String): Int = {
      val rels = ST.writeDataFiles(ks.map(k => (k, k * 1.0)).toDF("k", "v")
        .coalesce(1), root, tag).map(ST.footerEntry(root, _, "k"))
      val prior = if (base == 0) Nil else ST.manifestEntries(root, base)
      ST.commitEntries(root, base, prior ++ rels, 16,
        if (base == 0) Map("statsCol" -> "k") else ST.carriedMeta(root, base))
    }
    // backdate a version's IN-COMMIT timestamp (`#cts` metadata) — the
    // clock VACUUM RETAIN / TIMESTAMP AS OF resolve against since ICT
    def backdateCts(v: Int, millis: Long): Unit = {
      val p = ST.manifestPath(root, v)
      val doctored = new String(java.nio.file.Files.readAllBytes(p)).linesIterator
        .map(l => if (l.startsWith("#cts\t")) s"#cts\t$millis" else l)
        .mkString("\n")
      java.nio.file.Files.write(p, doctored.getBytes)
    }
    commitRows(0, 1L to 2L, "a") // v1
    commitRows(1, 3L to 4L, "b") // v2
    commitRows(2, 5L to 6L, "c") // v3
    // backdate v1/v2's commit clocks ten days; v3 stays fresh. Then
    // SCRAMBLE the mtimes the OTHER way (all fresh) — a table copy /
    // rsync does exactly this, and resolution must follow the
    // in-commit stamp, not the filesystem
    val oldMs = System.currentTimeMillis - 10L * 24 * 3600 * 1000
    backdateCts(1, oldMs); backdateCts(2, oldMs + 1)
    (1 to 3).foreach(v => java.nio.file.Files.setLastModifiedTime(
      ST.manifestPath(root, v),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis)))
    // a generous window retains everything (all manifests survive)
    spark.sql(s"VACUUM '$root' RETAIN ${30 * 24} HOURS").collect()
    assert((1 to 3).forall(v => java.nio.file.Files.exists(ST.manifestPath(root, v))))
    // 48h: the backdated versions retire DESPITE fresh mtimes, the
    // in-window one survives — time travel inside the window keeps
    // working by construction
    spark.sql(s"VACUUM '$root' RETAIN 48 HOURS").collect()
    assert(!java.nio.file.Files.exists(ST.manifestPath(root, 1)))
    assert(!java.nio.file.Files.exists(ST.manifestPath(root, 2)))
    assert(java.nio.file.Files.exists(ST.manifestPath(root, 3)))
    assert(ST.read(spark, root).count() == 6, "current snapshot lost content")
    // RETAIN 0 HOURS — Delta's escape hatch: only the current snapshot
    commitRows(3, Seq(7L), "d") // v4
    backdateCts(3, System.currentTimeMillis - 3600 * 1000)
    spark.sql(s"VACUUM '$root' RETAIN 0 HOURS").collect()
    assert(!java.nio.file.Files.exists(ST.manifestPath(root, 3)) &&
      java.nio.file.Files.exists(ST.manifestPath(root, 4)))
    assert(ST.read(spark, root).count() == 7)
  }

  test("scoped OPTIMIZE compacts only the WHERE window's files; rest carry by reference") {
    import spark.implicits._
    val root = Engine.tmpDir("graft_sql_optw")
    Engine.listDir(Paths.get(root)).foreach(Engine.deleteRecursively)
    // three key-disjoint files: [1,10], [11,20], [21,30] — the scope
    // covers the middle one only; split it into two fragments so the
    // compaction has something to compact
    val frags =
      (ST.writeDataFiles((1L to 10L).map(k => (k, k * 1.0)).toDF("k", "v")
        .coalesce(1), root, "lo") ++
      ST.writeDataFiles((11L to 15L).map(k => (k, k * 1.0)).toDF("k", "v")
        .coalesce(1), root, "mid1") ++
      ST.writeDataFiles((16L to 20L).map(k => (k, k * 1.0)).toDF("k", "v")
        .coalesce(1), root, "mid2") ++
      ST.writeDataFiles((21L to 30L).map(k => (k, k * 1.0)).toDF("k", "v")
        .coalesce(1), root, "hi")).map(ST.footerEntry(root, _, "k"))
    ST.commitEntries(root, 0, frags, shardSize = 8, Map("statsCol" -> "k"))
    val before = ST.manifestEntries(root, 1).map(_.rel)
    val v2 = spark.sql(
      s"OPTIMIZE '$root' CLUSTER BY (k) TARGET 1 WHERE k BETWEEN 11 AND 20")
      .head().getInt(0)
    val after = ST.manifestEntries(root, v2).map(_.rel)
    // untouched files carried BY REFERENCE (same rels); the two middle
    // fragments compacted into one
    assert(after.count(before.contains) == 2,
      s"out-of-scope files must carry by reference: $before -> $after")
    assert(after.size == 3, s"expected 2 carried + 1 compacted: $after")
    assert(ST.manifestMeta(root, v2)("optimize").startsWith("cow:2of4"),
      ST.manifestMeta(root, v2).toString)
    // content identical; the compacted file owns exactly [11,20]
    assert(ST.read(spark, root).collect().map(_.getLong(0)).sorted.toSeq ==
      (1L to 30L))
    val compacted = after.filterNot(before.contains)
    assert(compacted.size == 1)
    val e = ST.manifestEntries(root, v2).find(_.rel == compacted.head).get
    assert(e.lo == 11L && e.hi == 20L, s"compacted stats wrong: $e")
    // zero-intersection scope is a no-op (no version mints)
    assert(spark.sql(
      s"OPTIMIZE '$root' CLUSTER BY (k) WHERE k BETWEEN 500 AND 600")
      .head().getInt(0) == v2)
    // scoping by a non-stats column refuses
    val e2 = intercept[Exception](spark.sql(
      s"OPTIMIZE '$root' CLUSTER BY (v) WHERE v BETWEEN 1 AND 2").collect())
    assert(e2.getMessage.contains("stats column") ||
      e2.getMessage.contains("stats"), e2.getMessage)
    // a table with NO stats column refuses the scoped form outright —
    // sentinel entries would silently turn "scoped" into a 100% rewrite
    val bare = Engine.tmpDir("graft_sql_optw_bare")
    Engine.listDir(Paths.get(bare)).foreach(Engine.deleteRecursively)
    ST.commitEntries(bare, 0,
      ST.writeDataFiles((1L to 5L).map(k => (k, k * 1.0)).toDF("k", "v")
        .coalesce(1), bare, "a").map(ST.footerEntry(bare, _, "k")),
      shardSize = 8)
    val e3 = intercept[Exception](spark.sql(
      s"OPTIMIZE '$bare' CLUSTER BY (k) WHERE k BETWEEN 1 AND 2").collect())
    assert(e3.getMessage.contains("no stats column"), e3.getMessage)
  }

  test("CONVERT TO SNAPSHOT adopts a plain parquet dir in place: zero copies, full surface (r16)") {
    import spark.implicits._
    val root = Engine.tmpDir("graft_sql_convert")
    Engine.deleteRecursively(Paths.get(root))
    (1L to 40L).map(k => (k, k * 1.0)).toDF("k", "v")
      .repartitionByRange(4, col("k")).write.parquet(root)
    val parts = {
      val st = java.nio.file.Files.walk(Paths.get(root))
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.filter(p => java.nio.file.Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet"))
          .map(p => p -> java.nio.file.Files.getLastModifiedTime(p)).toMap
      } finally st.close()
    }
    assert(parts.size == 4)
    val v1 = spark.sql(s"CONVERT TO SNAPSHOT '$root' CLUSTER BY (k)")
      .head().getInt(0)
    assert(v1 == 1)
    // adoption is METADATA-ONLY: the same files, byte- and mtime-
    // untouched, now ARE the manifest's entries
    parts.foreach { case (p, mt) =>
      assert(java.nio.file.Files.getLastModifiedTime(p) == mt, s"$p moved") }
    assert(ST.manifestEntries(root, 1).map(_.rel).toSet ==
      parts.keys.map(p => Paths.get(root).toAbsolutePath.normalize
        .relativize(p.toAbsolutePath).toString).toSet)
    // footer stats harvested: a range filter prunes to one of 4 files
    val scan = spark.read.format("graft-snapshot").load(root).filter(col("k") <= 5)
    assert(scan.collect().map(_.getLong(0)).toSet == (1L to 5L).toSet)
    assert(scan.rdd.getNumPartitions == 1,
      s"adopted footer stats must prune: ${scan.rdd.getNumPartitions} partitions")
    // full citizen: DML, OPTIMIZE, time travel over the adopted v1
    spark.sql(s"DELETE FROM '$root' WHERE k = 7").collect()
    assert(ST.read(spark, root).count() == 39)
    assert(ST.readAt(spark, root, 1).count() == 40, "v1 travel must pre-date the DML")
    spark.sql(s"OPTIMIZE '$root' CLUSTER BY (k) TARGET 2").collect()
    assert(ST.read(spark, root).count() == 39)
    // refusals: double convert, hive-style partition dir, empty dir
    val e1 = intercept[Exception](
      spark.sql(s"CONVERT TO SNAPSHOT '$root'").collect())
    assert(e1.getMessage.contains("already a snapshot table"), e1.getMessage)
    val hive = Engine.tmpDir("graft_sql_convert_hive")
    Engine.deleteRecursively(Paths.get(hive))
    (1L to 10L).map(k => (k, k % 2)).toDF("k", "p")
      .write.partitionBy("p").parquet(hive)
    val e2 = intercept[Exception](
      spark.sql(s"CONVERT TO SNAPSHOT '$hive' CLUSTER BY (k)").collect())
    assert(e2.getMessage.contains("hive-style"), e2.getMessage)
    val empty = Engine.tmpDir("graft_sql_convert_empty")
    Engine.listDir(Paths.get(empty)).foreach(Engine.deleteRecursively)
    val e3 = intercept[Exception](
      spark.sql(s"CONVERT TO SNAPSHOT '$empty'").collect())
    assert(e3.getMessage.contains("no *.parquet"), e3.getMessage)
    // a stats column absent from the files refuses rather than minting
    // a table whose every entry is the never-pruned sentinel
    val flat = Engine.tmpDir("graft_sql_convert_badstats")
    Engine.deleteRecursively(Paths.get(flat))
    Seq((1L, 1.0)).toDF("k", "v").write.parquet(flat)
    val e4 = intercept[Exception](
      spark.sql(s"CONVERT TO SNAPSHOT '$flat' CLUSTER BY (nope)").collect())
    assert(e4.getMessage.contains("not in the resident"), e4.getMessage)
    // ...and the rows-only spelling (no CLUSTER BY) adopts fine
    assert(spark.sql(s"CONVERT TO SNAPSHOT '$flat'").head().getInt(0) == 1)
    assert(ST.read(spark, flat).count() == 1)
    // hidden/temporary files (Spark's hiddenFileFilter rule: any '_'/
    // '.'-prefixed path segment) are INVISIBLE to plain parquet reads
    // and must not be adopted — a killed job's _temporary attempt
    // would otherwise serve duplicate/torn rows (r16 review)
    val dirty = Engine.tmpDir("graft_sql_convert_dirty")
    Engine.deleteRecursively(Paths.get(dirty))
    Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v").coalesce(1).write.parquet(dirty)
    val tmpDir2 = Paths.get(dirty, "_temporary", "0")
    java.nio.file.Files.createDirectories(tmpDir2)
    val src = {
      val st = java.nio.file.Files.walk(Paths.get(dirty))
      try { import scala.jdk.CollectionConverters._
        st.iterator().asScala.find(p => p.getFileName.toString.endsWith(".parquet")
          && !p.toString.contains("_temporary")).get
      } finally st.close()
    }
    java.nio.file.Files.copy(src, tmpDir2.resolve("part-attempt.parquet"))
    java.nio.file.Files.copy(src, Paths.get(dirty, ".stale.parquet"))
    spark.sql(s"CONVERT TO SNAPSHOT '$dirty' CLUSTER BY (k)").collect()
    assert(ST.read(spark, dirty).count() == 2,
      "hidden/_temporary parquet files must not be adopted")
    assert(ST.manifestEntries(dirty, 1).size == 1)
    // a directory holding files of DIVERGENT schemas (two pipelines,
    // partial rewrites) refuses loudly at convert, naming both files —
    // adopting it would null-fill/drop the minority files' columns on
    // the uniform read route with no evolution marker (r16 ADVICE;
    // validated per footer inside the distributed harvest)
    val mixed = Engine.tmpDir("graft_sql_convert_mixed")
    Engine.deleteRecursively(Paths.get(mixed))
    Seq((1L, 1.0)).toDF("k", "v").coalesce(1).write.parquet(mixed)
    val extra = Engine.tmpDir("graft_sql_convert_mixed_extra")
    Engine.deleteRecursively(Paths.get(extra))
    Seq((2L, 2.0, "x")).toDF("k", "v", "w").coalesce(1).write.parquet(extra)
    val wide = {
      val st = java.nio.file.Files.walk(Paths.get(extra))
      try { import scala.jdk.CollectionConverters._
        st.iterator().asScala.find(_.getFileName.toString.endsWith(".parquet")).get
      } finally st.close()
    }
    java.nio.file.Files.copy(wide, Paths.get(mixed, "zz-wide.parquet"))
    val e5 = intercept[Exception](
      spark.sql(s"CONVERT TO SNAPSHOT '$mixed' CLUSTER BY (k)").collect())
    assert(e5.getMessage.contains("disagree on schema") &&
      e5.getMessage.contains("zz-wide.parquet"), e5.getMessage)
    assert(ST.currentVersion(mixed) == 0, "refused convert must not commit")
  }

  test("RESTORE TO TIMESTAMP AS OF resolves via the commit clock") {
    import spark.implicits._
    val root = Engine.tmpDir("graft_sql_restore_ts")
    Engine.listDir(Paths.get(root)).foreach(Engine.deleteRecursively)
    def commitRows(base: Int, ks: Seq[Long], tag: String): Int = {
      val rels = ST.writeDataFiles(ks.map(k => (k, k * 1.0)).toDF("k", "v")
        .coalesce(1), root, tag).map(ST.footerEntry(root, _, "k"))
      val prior = if (base == 0) Nil else ST.manifestEntries(root, base)
      ST.commitEntries(root, base, prior ++ rels, 16,
        if (base == 0) Map("statsCol" -> "k") else ST.carriedMeta(root, base))
    }
    commitRows(0, Seq(1L), "a"); commitRows(1, Seq(2L), "b")
    commitRows(2, Seq(3L), "c")
    val t2 = ST.commitTimeMillis(root, 2)
    // millis spelling restores to the newest commit at-or-before t2
    val v4 = spark.sql(
      s"RESTORE TABLE '$root' TO TIMESTAMP AS OF '$t2'").head().getInt(0)
    assert(v4 == 4 && ST.read(spark, root).count() == 2,
      s"expected the v2 state restored: v=$v4 rows=${ST.read(spark, root).count()}")
    // a pre-history timestamp refuses
    val e = intercept[Exception](spark.sql(
      s"RESTORE TABLE '$root' TO TIMESTAMP AS OF '${t2 - 10000000}'").collect())
    assert(e.getMessage.contains("no retained commit"), e.getMessage)
    // DATE-ONLY literal (Delta's spelling): midnight UTC — tomorrow's
    // date is after every commit, so it restores to the newest state
    val tomorrow = java.time.LocalDate.now(java.time.ZoneOffset.UTC).plusDays(1)
    val vd = spark.sql(
      s"RESTORE TABLE '$root' TO TIMESTAMP AS OF '$tomorrow'").head().getInt(0)
    assert(vd > 0 && ST.read(spark, root).count() == 2,
      s"date-only literal must resolve (midnight UTC, newest = the " +
        s"restored v2 state): v=$vd rows=${ST.read(spark, root).count()}")
    // ...and it IS midnight, not end-of-day: epoch-1970 resolves to none
    val e2 = intercept[Exception](spark.sql(
      s"RESTORE TABLE '$root' TO TIMESTAMP AS OF '1970-01-02'").collect())
    assert(e2.getMessage.contains("no retained commit"), e2.getMessage)
    // an unparseable literal refuses NAMING the accepted formats, not
    // a raw DateTimeParseException (ADVICE r15)
    val e3 = intercept[Exception](spark.sql(
      s"RESTORE TABLE '$root' TO TIMESTAMP AS OF 'last tuesday'").collect())
    assert(e3.getMessage.contains("accepted") &&
      e3.getMessage.contains("yyyy-MM-dd"), e3.getMessage)
  }

  test("VACUUM DRY RUN previews exactly what the real VACUUM reclaims, deleting nothing") {
    import spark.implicits._
    val root = Engine.tmpDir("graft_sql_vacdry")
    Engine.listDir(Paths.get(root)).foreach(Engine.deleteRecursively)
    def commitRows(base: Int, ks: Seq[Long], tag: String): Int = {
      val rels = ST.writeDataFiles(ks.map(k => (k, k * 1.0)).toDF("k", "v")
        .coalesce(1), root, tag).map(ST.footerEntry(root, _, "k"))
      ST.commitEntries(root, base, rels, 16,
        if (base == 0) Map("statsCol" -> "k") else ST.carriedMeta(root, base))
    }
    commitRows(0, Seq(1L, 2L), "a")       // v1: file A
    commitRows(1, Seq(1L, 2L, 3L), "b")   // v2 REPLACES the listing (file B only)
    val preview = spark.sql(s"VACUUM '$root' KEEP FROM 2 DRY RUN").collect()
      .map(_.getString(0)).toSet
    // nothing deleted by the preview
    assert(java.nio.file.Files.exists(ST.manifestPath(root, 1)))
    assert(ST.readAt(spark, root, 1).count() == 2, "dry run must not delete")
    assert(preview.exists(_.endsWith(".parquet")) &&
      preview.exists(_.contains("v00001")), s"preview incomplete: $preview")
    // the real vacuum reclaims EXACTLY the previewed set
    val beforeFiles = (Engine.listDir(Paths.get(root)) ++
      Engine.listDir(Paths.get(root, "_manifests"))).map(_.toString).toSet
    ST.vacuum(root, keepFrom = 2)
    val afterFiles = (Engine.listDir(Paths.get(root)) ++
      Engine.listDir(Paths.get(root, "_manifests"))).map(_.toString).toSet
    val reclaimed = (beforeFiles -- afterFiles).map(p =>
      Paths.get(root).toAbsolutePath.relativize(
        Paths.get(p).toAbsolutePath).toString)
    assert(reclaimed == preview,
      s"preview/delete drift: previewed $preview, reclaimed $reclaimed")
  }

  test("TIMESTAMP AS OF prefers in-commit timestamps over scrambled mtimes") {
    val w = java.nio.file.Files.createTempDirectory("graft_ict_cat").toString
    spark.conf.set("spark.sql.catalog.gict", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gict.root", w)
    spark.sql("CREATE TABLE gict.t (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO gict.t VALUES (1, 1.0)")        // v1
    spark.sql("INSERT INTO gict.t VALUES (2, 2.0)")        // v2
    val root = Paths.get(w, "t").toString
    val t1 = ST.commitTimeMillis(root, 1)
    val t2 = ST.commitTimeMillis(root, 2)
    assert(t2 > t1, "ICT must be strictly version-monotone")
    // scramble every mtime to epoch — a backup/restore would do this;
    // resolution must not notice
    (1 to 2).foreach(v => java.nio.file.Files.setLastModifiedTime(
      ST.manifestPath(root, v),
      java.nio.file.attribute.FileTime.fromMillis(1000L)))
    assert(ST.commitTimeMillis(root, 1) == t1 && ST.commitTimeMillis(root, 2) == t2,
      "commit clock must come from the manifest, not the filesystem")
    val tsLit = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS").withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(t1))
    val atV1 = spark.sql(s"SELECT * FROM gict.t TIMESTAMP AS OF '$tsLit'").collect()
    assert(atV1.map(_.getLong(0)).toSet == Set(1L),
      s"TIMESTAMP AS OF must resolve v1 via ICT: ${atV1.mkString(",")}")
  }

  test("conditional NOT MATCHED INSERT: only source rows passing the condition insert") {
    import spark.implicits._
    val root = Engine.tmpDir("graft_sql_condins")
    Engine.listDir(Paths.get(root)).foreach(Engine.deleteRecursively)
    ST.commitEntries(root, 0,
      ST.writeDataFiles((1L to 3L).map(k => (k, k * 1.0)).toDF("k", "v")
        .coalesce(1), root, "a").map(ST.footerEntry(root, _, "k")),
      shardSize = 8, Map("statsCol" -> "k"))
    // source: k=1 matched; k=10/11 unmatched, only k=10 passes the gate
    Seq((1L, 9.0), (10L, 10.0), (11L, -11.0)).toDF("k", "v")
      .createOrReplaceTempView("ci_src")
    spark.sql(s"""MERGE INTO '$root' AS t USING ci_src AS s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED AND s.v > 0 THEN INSERT *""").collect()
    val got = ST.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 9.0, 2L -> 2.0, 3L -> 3.0, 10L -> 10.0),
      s"conditional insert wrong: $got")
    // a t.-reference in the insert condition has no row to bind — loud
    val e = intercept[Exception](spark.sql(
      s"""MERGE INTO '$root' AS t USING ci_src AS s ON t.k = s.k
        WHEN NOT MATCHED AND t.v > 0 THEN INSERT *""").collect())
    assert(!e.getMessage.contains("cannot parse"), e.getMessage)
  }

  test("ANSI MERGE SET expressions may contain CASE WHEN without breaking clause parsing") {
    import spark.implicits._
    val root = Engine.tmpDir("graft_sql_ansimerge_case")
    Engine.listDir(Paths.get(root)).foreach(Engine.deleteRecursively)
    ST.commitEntries(root, 0,
      ST.writeDataFiles((1L to 4L).map(k => (k, k * 1.0)).toDF("k", "v")
        .coalesce(1), root, "a").map(ST.footerEntry(root, _, "k")),
      shardSize = 8, Map("statsCol" -> "k"))
    Seq((1L, 5.0), (2L, -5.0)).toDF("k", "delta").createOrReplaceTempView("am_case")
    spark.sql(s"""MERGE INTO '$root' AS t USING am_case AS s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = CASE WHEN s.delta > 0 THEN t.v + s.delta ELSE 0.0 END""")
      .collect()
    val got = ST.read(spark, root).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 6.0 && got(2L) == 0.0 && got(3L) == 3.0, got.toString)
  }

  test("a DELETE matching every row leaves a READABLE empty table, not a brick") {
    import spark.implicits._
    val root = Engine.tmpDir("graft_sql_delete_all")
    Engine.listDir(Paths.get(root)).foreach(Engine.deleteRecursively)
    ST.commitEntries(root, 0,
      ST.writeDataFiles((1L to 6L).map(k => (k, k * 1.0)).toDF("k", "v")
        .coalesce(1), root, "a").map(ST.footerEntry(root, _, "k")),
      shardSize = 8, Map("statsCol" -> "k"))
    spark.sql(s"DELETE FROM '$root' WHERE k >= 0").collect()
    assert(ST.manifestEntries(root, 2).isEmpty)
    // the empty version reads back with its schema (the deleting commit
    // captured it) through BOTH the Scala API and the DSv2 connector
    val df = ST.read(spark, root)
    assert(df.count() == 0 && df.columns.toSeq == Seq("k", "v"))
    val dsv2 = spark.read.format("graft-snapshot").load(root)
    assert(dsv2.count() == 0 && dsv2.columns.toSeq == Seq("k", "v"))
    // the pre-delete snapshot still time-travels
    assert(ST.readAt(spark, root, 1).count() == 6)
    // and the table accepts new appends afterwards
    spark.createDataFrame(Seq((9L, 9.0))).toDF("k", "v")
      .write.format("graft-snapshot").mode("append").save(root)
    assert(ST.read(spark, root).count() == 1)
  }

  test("UPDATE tolerates WHERE inside string literals and no-ops on an empty table") {
    import spark.implicits._
    val root = Engine.tmpDir("graft_sql_update_quote")
    Engine.listDir(Paths.get(root)).foreach(Engine.deleteRecursively)
    ST.commitEntries(root, 0,
      ST.writeDataFiles(Seq((1L, "x"), (2L, "y")).toDF("k", "note")
        .coalesce(1), root, "a").map(ST.footerEntry(root, _, "k")),
      shardSize = 8, Map("statsCol" -> "k"))
    // the literal contains ' WHERE ' — the split must find the REAL one
    spark.sql(s"UPDATE '$root' SET note = 'save WHERE possible' WHERE k = 1").collect()
    val got = ST.read(spark, root).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "save WHERE possible" && got(2L) == "y", got.toString)
    // an ESCAPED quote inside the literal must not flip the scanner's
    // quoted state (the '' doubling spelling — Spark's ANSI escape)
    spark.sql(s"UPDATE '$root' SET note = 'don''t WHERE ever' WHERE k = 2").collect()
    val got2 = ST.read(spark, root).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got2(2L) == "don't WHERE ever", got2.toString)
    // Spark lexes double-quoted strings as literals too — same immunity
    spark.sql(s"""UPDATE '$root' SET note = "x WHERE y" WHERE k = 1""").collect()
    val got3 = ST.read(spark, root).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got3(1L) == "x WHERE y", got3.toString)
    // UPDATE against a table with no committed version is a no-op, not
    // a filesystem exception
    val empty = Engine.tmpDir("graft_sql_update_empty")
    Engine.listDir(Paths.get(empty)).foreach(Engine.deleteRecursively)
    java.nio.file.Files.createDirectories(Paths.get(s"$empty/_manifests"))
    assert(ST.update(spark, empty, Seq("k" -> "1"), "k = 2") == 0)
  }

  test("RESTORE across an OPTIMIZE that re-clustered takes the TARGET version's statsCol") {
    import spark.implicits._
    val root = Engine.tmpDir("graft_sql_restore_stats")
    Engine.listDir(Paths.get(root)).foreach(Engine.deleteRecursively)
    // v1: two day-clustered files, statsCol=ep_day
    val entries = (ST.writeDataFiles(Seq((1L, 10L), (2L, 10L)).toDF("uid", "ep_day")
        .coalesce(1), root, "d1") ++
      ST.writeDataFiles(Seq((3L, 20L), (4L, 20L)).toDF("uid", "ep_day")
        .coalesce(1), root, "d2")).map(ST.footerEntry(root, _, "ep_day"))
    ST.commitEntries(root, 0, entries, shardSize = 8, Map("statsCol" -> "ep_day"))
    // v2: re-clustered on uid (statsCol flips)
    ST.optimizeClustered(spark, root, "uid", targetFiles = 2)
    assert(ST.manifestMeta(root, 2)("statsCol") == "uid")
    // v3: restore to v1 — the entries' [lo,hi] are ep_day bounds, so
    // the restored commit must say statsCol=ep_day; pairing them with
    // uid would silently mis-prune
    ST.restore(root, 1)
    assert(ST.manifestMeta(root, 3)("statsCol") == "ep_day",
      s"restore carried the wrong statsCol: ${ST.manifestMeta(root, 3)}")
    // and a stats-pruned read on ep_day is correct after the restore
    val pruned = ST.readPruned(spark, root, "ep_day", 20L, 20L)
    assert(pruned.filter(col("ep_day") === 20L).count() == 2)
  }
}
