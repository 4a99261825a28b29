package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The name-addressed catalog surface: CREATE / INSERT / SELECT /
  * SHOW / DROP through plain spark.sql against `graft.<table>` names,
  * plus interop with the path-addressed tools on the same directory. */
class GraftCatalogSpec extends AnyFunSuite {
  import TestSession._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft_warehouse").toString
    spark.conf.set("spark.sql.catalog.gcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcat.root", w)
    w
  }

  test("CREATE TABLE yields a selectable empty table; first INSERT fills it") {
    warehouse
    spark.sql("CREATE TABLE gcat.scores (user_id BIGINT, p DOUBLE)")
    assert(spark.sql("SELECT * FROM gcat.scores").columns.toSeq ==
      Seq("user_id", "p"))
    assert(spark.sql("SELECT * FROM gcat.scores").count() == 0)
    // manifest-only COUNT(*) on the empty table answers 0, not an error
    assert(spark.sql("SELECT count(*) FROM gcat.scores").head().getLong(0) == 0)

    spark.sql("INSERT INTO gcat.scores VALUES (1, 0.9), (2, 0.1), (3, 0.5)")
    assert(spark.sql("SELECT count(*) FROM gcat.scores").head().getLong(0) == 3)
    assert(spark.sql("SELECT p FROM gcat.scores WHERE user_id = 2").head().getDouble(0) == 0.1)
    // appends accumulate as snapshot versions
    spark.sql("INSERT INTO gcat.scores VALUES (4, 0.7)")
    assert(spark.sql("SELECT count(*) FROM gcat.scores").head().getLong(0) == 4)
  }

  test("CTAS materializes a query into a new catalog table") {
    warehouse
    spark.sql(
      "CREATE TABLE gcat.score_agg AS SELECT user_id, p * 2 AS p2 FROM gcat.scores WHERE p >= 0.5")
    val got = spark.sql("SELECT user_id, p2 FROM gcat.score_agg ORDER BY user_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == Seq((1L, 1.8), (3L, 1.0), (4L, 1.4)))
  }

  test("catalog names and path tools address the same snapshot table") {
    warehouse
    val root = s"$warehouse/scores"
    val O = graft.operators.SnapshotTable
    // the catalog table IS a snapshot table: Scala API reads it
    assert(O.read(spark, root).count() ==
      spark.sql("SELECT count(*) FROM gcat.scores").head().getLong(0))
    // time travel to the first insert through the path connector
    assert(spark.read.format("graft-snapshot").option("version", "1")
      .load(root).count() == 3)
    // path-addressed maintenance SQL works on catalog tables
    val v = spark.sql(s"OPTIMIZE '$root' CLUSTER BY (user_id)").head().getInt(0)
    assert(v > 0)
    assert(spark.sql("SELECT count(*) FROM gcat.scores").head().getLong(0) == 4)
  }

  test("SHOW TABLES lists catalog tables; DROP removes the directory") {
    warehouse
    spark.sql("CREATE TABLE gcat.doomed (x BIGINT)")
    val listed = spark.sql("SHOW TABLES IN gcat").collect().map(_.getString(1)).toSet
    assert(listed.contains("doomed") && listed.contains("scores"))
    spark.sql("DROP TABLE gcat.doomed")
    assert(!spark.sql("SHOW TABLES IN gcat").collect().map(_.getString(1)).contains("doomed"))
    assert(!Files.exists(java.nio.file.Paths.get(warehouse, "doomed")))
  }

  test("namespaces are directories: CREATE NAMESPACE + qualified tables") {
    warehouse
    spark.sql("CREATE NAMESPACE gcat.analytics")
    spark.sql("CREATE TABLE gcat.analytics.daily (d BIGINT, n BIGINT)")
    spark.sql("INSERT INTO gcat.analytics.daily VALUES (20260813, 7)")
    assert(spark.sql("SELECT n FROM gcat.analytics.daily WHERE d = 20260813")
      .head().getLong(0) == 7)
    assert(Files.isDirectory(java.nio.file.Paths.get(warehouse, "analytics", "daily")))
  }

  test("INSERT OVERWRITE replaces the table contents as one new version") {
    warehouse
    spark.sql("CREATE TABLE gcat.ow (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO gcat.ow VALUES (1, 1.0), (2, 2.0)")
    val before = graft.operators.SnapshotTable
      .currentVersion(s"$warehouse/ow")
    spark.sql("INSERT OVERWRITE gcat.ow VALUES (9, 9.0)")
    val got = spark.sql("SELECT k, v FROM gcat.ow").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == Seq((9L, 9.0)), s"overwrite left: ${got.toSeq}")
    // the superseded version is one commit back and still time-travels
    val root = s"$warehouse/ow"
    assert(graft.operators.SnapshotTable.currentVersion(root) == before + 1)
    assert(spark.read.format("graft-snapshot").option("version", before.toString)
      .load(root).count() == 2)
  }

  test("DELETE FROM removes only WHERE=TRUE rows, copy-on-write") {
    warehouse
    spark.sql("CREATE TABLE gcat.del (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO gcat.del VALUES (1, 1.0), (2, 2.0), (3, 3.0), (4, CAST(NULL AS DOUBLE))")
    spark.sql("DELETE FROM gcat.del WHERE v >= 2.0")
    val got = spark.sql("SELECT k FROM gcat.del ORDER BY k").collect().map(_.getLong(0))
    // k=4 has v NULL: predicate NULL -> row kept, exactly SQL semantics
    assert(got.toSeq == Seq(1L, 4L), s"delete kept: ${got.toSeq}")
    // deleting on an unsupported predicate is rejected, not mis-applied
    intercept[Exception] {
      spark.sql("DELETE FROM gcat.del WHERE k + 1 = 2")
    }
    assert(spark.sql("SELECT count(*) FROM gcat.del").head().getLong(0) == 2)
  }

  test("concurrent INSERTs through the catalog route race the CAS and all land") {
    warehouse
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    spark.sql("CREATE TABLE gcat.race (k BIGINT, v DOUBLE)")
    val writers = 5
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      // the name-addressed write path (catalog → DSv2 BatchWrite →
      // manifest CAS) under the same writer race the path-route spec
      // pins: every INSERT must survive a lost CAS by retrying
      val futs = (1 to writers).map { i => Future {
        spark.sql(s"INSERT INTO gcat.race VALUES ($i, $i.5)")
      }}
      Await.result(Future.sequence(futs), 180.seconds)
    } finally pool.shutdown()
    val got = spark.sql("SELECT k FROM gcat.race ORDER BY k").collect().map(_.getLong(0))
    assert(got.toSeq == (1L to writers.toLong), s"lost inserts: ${got.toSeq}")
    assert(graft.operators.SnapshotTable.currentVersion(s"$warehouse/race") == writers,
      "each INSERT must commit exactly one consecutive version")
  }

  test("maintenance SQL addresses catalog tables BY NAME — path≡name on the same directory") {
    warehouse
    val root = s"$warehouse/scores"
    val ST = graft.operators.SnapshotTable
    // OPTIMIZE by name commits on the same directory the path route
    // addresses: consecutive versions, identical contents
    val before = ST.currentVersion(root)
    val vName = spark.sql("OPTIMIZE gcat.scores CLUSTER BY (user_id)").head().getInt(0)
    assert(vName == before + 1, s"name-route OPTIMIZE: want ${before + 1}, got $vName")
    val vPath = spark.sql(s"OPTIMIZE '$root' CLUSTER BY (user_id)").head().getInt(0)
    assert(vPath == vName + 1, "path route must continue the SAME version chain")
    assert(spark.sql("SELECT count(*) FROM gcat.scores").head().getLong(0) == 4)
    // DESCRIBE HISTORY by name reads the same manifest log
    val hName = spark.sql("DESCRIBE HISTORY gcat.scores").collect()
    val hPath = spark.sql(s"DESCRIBE HISTORY '$root'").collect()
    assert(hName.length == vPath && hName.map(_.toString).toSeq == hPath.map(_.toString).toSeq,
      "name and path DESCRIBE HISTORY must agree row-for-row")
    // a namespaced name resolves through the same directory walk
    spark.sql("INSERT INTO gcat.analytics.daily VALUES (20260814, 3)")
    assert(spark.sql("OPTIMIZE gcat.analytics.daily CLUSTER BY (d)").head().getInt(0) > 0)
    // a name whose catalog is NOT a graft catalog is refused loudly
    val e = intercept[Exception] {
      spark.sql("OPTIMIZE nosuch.tbl CLUSTER BY (k)").collect()
    }
    assert(e.getMessage.contains("graft catalog"), s"wrong error: ${e.getMessage}")
  }

  test("DELETE on a schema-evolved table keeps evolved-column values (mergeSchema rewrite)") {
    warehouse
    import spark.implicits._
    val ST = graft.operators.SnapshotTable
    val root = s"$warehouse/evdel"
    Files.createDirectories(java.nio.file.Paths.get(root))
    // mixed-width layout: a narrow pre-evolution file and a wide
    // post-evolution file, committed under the `schema` marker (x18's
    // add-column evolution — old files are never rewritten)
    val narrow = (1L to 10L).map(k => (k, 100L)).toDF("k", "day")
    val wide = (11L to 20L).map(k => (k, 200L, k * 0.1)).toDF("k", "day", "q")
    val rels = ST.writeDataFiles(narrow, root, "a") ++ ST.writeDataFiles(wide, root, "b")
    ST.commitEntries(root, 0, rels.map(ST.footerEntry(root, _, "day")),
      shardSize = 8, Map("statsCol" -> "day", "schema" -> "evolved:+q"))
    // the evolved table is readable BY NAME: union schema at planning,
    // per-file null-fill at read — including a projection of ONLY the
    // evolved column, which intersects to zero scannable columns on the
    // narrow file (row count from the footer, no data pages)
    assert(spark.sql("SELECT * FROM gcat.evdel").columns.toSeq == Seq("k", "day", "q"))
    assert(spark.sql("SELECT q FROM gcat.evdel WHERE q IS NULL").count() == 10)
    assert(spark.sql("SELECT q FROM gcat.evdel").count() == 20)
    // the k-predicate gives day-stats nothing to prune: BOTH widths land
    // in the rewrite set — exactly the case where a non-mergeSchema read
    // samples one footer and silently nulls q for every surviving wide
    // row
    spark.sql("DELETE FROM gcat.evdel WHERE k <= 5")
    val got = spark.sql("SELECT k, q FROM gcat.evdel WHERE k >= 11 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length == 10 && got.forall { case (k, q) => math.abs(q - k * 0.1) < 1e-12 },
      s"evolved column lost in DELETE rewrite: ${got.take(3).toSeq}")
    // narrow-file survivors surface q as null, as before the delete
    val narrows = spark.sql("SELECT q FROM gcat.evdel WHERE k BETWEEN 6 AND 10").collect()
    assert(narrows.length == 5 && narrows.forall(_.isNullAt(0)))
    assert(spark.sql("SELECT count(*) FROM gcat.evdel").head().getLong(0) == 15)
  }

  test("DELETE prunes the rewrite to files whose stats admit a match") {
    warehouse
    import spark.implicits._
    val ST = graft.operators.SnapshotTable
    val root = s"$warehouse/delp"
    Files.createDirectories(java.nio.file.Paths.get(root))
    val d1 = (1L to 10L).map(k => (k, 100L)).toDF("k", "day")
    val d2 = (11L to 20L).map(k => (k, 200L)).toDF("k", "day")
    val rels = ST.writeDataFiles(d1, root, "a") ++ ST.writeDataFiles(d2, root, "b")
    ST.commitEntries(root, 0, rels.map(ST.footerEntry(root, _, "day")),
      shardSize = 8, Map("statsCol" -> "day"))
    val before = ST.manifestEntries(root, 1).map(_.rel).toSet
    spark.sql("DELETE FROM gcat.delp WHERE day = 200 AND k <= 15")
    val after = ST.manifestEntries(root, 2).map(_.rel).toSet
    // day-100 files carry over VERBATIM (stats exclude them from the
    // rewrite); only the day-200 side is copy-on-written
    val day100 = before.filter(_.contains("data_a_"))
    assert(day100.nonEmpty && day100.subsetOf(after),
      s"day-100 files should be untouched: before=$before after=$after")
    assert(before.filter(_.contains("data_b_")).forall(!after.contains(_)),
      "day-200 files should have been rewritten")
    assert(spark.sql("SELECT count(*) FROM gcat.delp").head().getLong(0) == 15)
  }

  test("ALTER TABLE RENAME moves the directory; data survives") {
    warehouse
    spark.sql("CREATE TABLE gcat.before_rn (x BIGINT)")
    spark.sql("INSERT INTO gcat.before_rn VALUES (42)")
    // the rename target resolves INSIDE the catalog: an unqualified
    // name stays in the same (root) namespace
    spark.sql("ALTER TABLE gcat.before_rn RENAME TO after_rn")
    assert(spark.sql("SELECT x FROM gcat.after_rn").head().getLong(0) == 42)
    assert(!Files.exists(java.nio.file.Paths.get(warehouse, "before_rn")))
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM gcat.before_rn")
    }
  }

  test("DROP NAMESPACE refuses a non-empty namespace without CASCADE") {
    warehouse
    spark.sql("CREATE NAMESPACE gcat.crowded")
    spark.sql("CREATE TABLE gcat.crowded.t (x BIGINT)")
    intercept[Exception] { spark.sql("DROP NAMESPACE gcat.crowded") }
    assert(Files.isDirectory(java.nio.file.Paths.get(warehouse, "crowded", "t")))
    spark.sql("DROP NAMESPACE gcat.crowded CASCADE")
    assert(!Files.exists(java.nio.file.Paths.get(warehouse, "crowded")))
  }

  test("declared-schema errors: duplicate create fails, missing table fails") {
    warehouse
    intercept[org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException] {
      spark.sql("CREATE TABLE gcat.scores (z BIGINT)")
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM gcat.never_created")
    }
  }

  test("VERSION AS OF / TIMESTAMP AS OF read historical snapshots; writes refused") {
    warehouse
    val ST = graft.operators.SnapshotTable
    spark.sql("CREATE TABLE gcat.tt (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO gcat.tt VALUES (1, 1.0), (2, 2.0)") // v1
    Thread.sleep(30) // mtime-distinct commits for TIMESTAMP AS OF
    spark.sql("INSERT INTO gcat.tt VALUES (3, 3.0)") // v2
    Thread.sleep(30)
    spark.sql("DELETE FROM gcat.tt WHERE k <= 2") // v3
    assert(ST.currentVersion(s"$warehouse/tt") == 3)
    def ks(q: String): Seq[Long] =
      spark.sql(q).collect().map(_.getLong(0)).sorted.toSeq
    assert(ks("SELECT k FROM gcat.tt") == Seq(3L))
    assert(ks("SELECT k FROM gcat.tt VERSION AS OF 1") == Seq(1L, 2L))
    assert(ks("SELECT k FROM gcat.tt VERSION AS OF 2") == Seq(1L, 2L, 3L))
    // filters still push into a historical scan (same DSv2 path)
    assert(ks("SELECT k FROM gcat.tt VERSION AS OF 2 WHERE k >= 2") == Seq(2L, 3L))
    // TIMESTAMP AS OF resolves to the newest commit at or before the
    // timestamp — v2's commit instant must see v2, not v3
    val t2 = ST.commitTimeMillis(s"$warehouse/tt", 2)
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone(
      spark.conf.get("spark.sql.session.timeZone")))
    val asOf2 = fmt.format(new java.util.Date(t2))
    assert(ks(s"SELECT k FROM gcat.tt TIMESTAMP AS OF '$asOf2'") == Seq(1L, 2L, 3L))
    // out-of-range version / pre-creation timestamp fail loudly
    val e1 = intercept[Exception](spark.sql("SELECT * FROM gcat.tt VERSION AS OF 99").collect())
    assert(e1.getMessage.contains("no version 99"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("SELECT * FROM gcat.tt TIMESTAMP AS OF '1999-01-01 00:00:00'").collect())
    assert(e2.getMessage.contains("no commit at or before"), e2.getMessage)
    // a historical snapshot is read-only
    val e3 = intercept[Exception](
      spark.sql("INSERT INTO gcat.tt VERSION AS OF 1 VALUES (9, 9.0)"))
    assert(e3 != null)
  }

  test("VACUUM retires time-travel targets cleanly: vacuumed versions error, survivors read") {
    warehouse
    val ST = graft.operators.SnapshotTable
    val root = s"$warehouse/ttv"
    spark.sql("CREATE TABLE gcat.ttv (k BIGINT)")
    spark.sql("INSERT INTO gcat.ttv VALUES (1)") // v1
    Thread.sleep(30)
    spark.sql("INSERT INTO gcat.ttv VALUES (2)") // v2
    Thread.sleep(30)
    val t1 = ST.commitTimeMillis(root, 1)
    spark.sql("INSERT INTO gcat.ttv VALUES (3)") // v3
    spark.sql(s"VACUUM '$root' KEEP FROM 2").collect()
    // the vacuumed version is no longer addressable — loud error, and
    // the CURRENT table is untouched by the failed historical read
    intercept[Exception] {
      spark.sql("SELECT * FROM gcat.ttv VERSION AS OF 1").collect()
    }
    assert(spark.sql("SELECT count(*) FROM gcat.ttv").head().getLong(0) == 3)
    // surviving versions still time-travel
    assert(spark.sql("SELECT count(*) FROM gcat.ttv VERSION AS OF 2").head().getLong(0) == 2)
    // a timestamp that RESOLVED to the vacuumed version before the
    // vacuum now has no commit at or before it — error, not a silent
    // jump forward to a version that did not exist at that time
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone(
      spark.conf.get("spark.sql.session.timeZone")))
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM gcat.ttv TIMESTAMP AS OF '${fmt.format(new java.util.Date(t1))}'")
        .collect()
    }
    assert(e.getMessage.contains("no commit at or before"), e.getMessage)
  }

  test("ALTER TABLE ADD COLUMN is metadata-only; reads null-fill; the next INSERT carries it") {
    warehouse
    val ST = graft.operators.SnapshotTable
    val root = s"$warehouse/ac"
    spark.sql("CREATE TABLE gcat.ac (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO gcat.ac VALUES (1, 1.0), (2, 2.0)") // v1
    val filesBefore = ST.manifestEntries(root, 1).map(_.rel).toSet
    spark.sql("ALTER TABLE gcat.ac ADD COLUMN q DOUBLE") // v2: metadata only
    assert(ST.currentVersion(root) == 2)
    // NOT ONE data file moved: same entries, same stats, new capture
    assert(ST.manifestEntries(root, 2).map(_.rel).toSet == filesBefore,
      "ALTER ADD COLUMN must not rewrite or add data files")
    val meta = ST.manifestMeta(root, 2)
    assert(meta.get("alter").contains("addcol:q") && meta.contains("schemaJson"))
    // existing rows surface null; the schema widened
    assert(spark.sql("SELECT * FROM gcat.ac").columns.toSeq == Seq("k", "v", "q"))
    assert(spark.sql("SELECT q FROM gcat.ac WHERE q IS NULL").count() == 2)
    // the next INSERT carries the column; reads mix widths correctly
    spark.sql("INSERT INTO gcat.ac VALUES (3, 3.0, 0.5)") // v3
    val got = spark.sql("SELECT k, q FROM gcat.ac ORDER BY k").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(got.toSeq == Seq((1L, None), (2L, None), (3L, Some(0.5))), got.toSeq)
    // time travel still reads the PRE-ALTER width
    assert(spark.sql("SELECT * FROM gcat.ac VERSION AS OF 1").columns.toSeq == Seq("k", "v"))
    // duplicate add and non-add changes are refused
    val e1 = intercept[Exception](spark.sql("ALTER TABLE gcat.ac ADD COLUMN q BIGINT"))
    assert(e1.getMessage.contains("already exists"), e1.getMessage)
    // DROP COLUMN is supported since r13 (column mapping): metadata-
    // only, the physical stays in the files unread — ColumnMappingSpec
    // drives the full lifecycle; here just prove the catalog routes it
    spark.sql("ALTER TABLE gcat.ac DROP COLUMN v")
    assert(spark.table("gcat.ac").columns.toSeq == Seq("k", "q"))
    // a second widening extends the SAME marker lineage; under the
    // mapping the ADD's storage name is FRESH (tag_<uuid>), so the
    // marker records that physical name
    spark.sql("ALTER TABLE gcat.ac ADD COLUMN tag STRING")
    val marker = ST.manifestMeta(root, ST.currentVersion(root))("schema")
    assert(marker.startsWith("evolved:+q,tag"), marker)
    assert(spark.sql("SELECT tag FROM gcat.ac WHERE tag IS NULL").count() == 3)
    // ALTER on a never-written table updates the declared schema file
    spark.sql("CREATE TABLE gcat.ac_empty (a BIGINT)")
    spark.sql("ALTER TABLE gcat.ac_empty ADD COLUMN b DOUBLE")
    assert(spark.sql("SELECT * FROM gcat.ac_empty").columns.toSeq == Seq("a", "b"))
  }

  test("VERSION AS OF plans with the schema AS OF that version") {
    warehouse
    import spark.implicits._
    val ST = graft.operators.SnapshotTable
    val root = s"$warehouse/ttev"
    Files.createDirectories(java.nio.file.Paths.get(root))
    val narrow = (1L to 5L).map(k => (k, 1.0 * k)).toDF("k", "v")
    ST.commitEntries(root, 0,
      ST.writeDataFiles(narrow, root, "a").map(ST.footerEntry(root, _, "k")),
      shardSize = 8, Map("statsCol" -> "k")) // v1: (k, v)
    val wide = (6L to 8L).map(k => (k, 1.0 * k, k * 0.5)).toDF("k", "v", "q")
    ST.commitEntries(root, 1,
      (ST.manifestEntries(root, 1) ++
        ST.writeDataFiles(wide, root, "b").map(ST.footerEntry(root, _, "k"))),
      shardSize = 8, Map("statsCol" -> "k", "schema" -> "evolved:+q")) // v2: +q
    // current read surfaces the union width; the v1 read must NOT —
    // the column did not exist in that snapshot
    assert(spark.sql("SELECT * FROM gcat.ttev").columns.toSeq == Seq("k", "v", "q"))
    assert(spark.sql("SELECT * FROM gcat.ttev VERSION AS OF 1").columns.toSeq == Seq("k", "v"))
    assert(spark.sql("SELECT count(*) FROM gcat.ttev VERSION AS OF 1").head().getLong(0) == 5)
    val e = intercept[Exception](
      spark.sql("SELECT q FROM gcat.ttev VERSION AS OF 1").collect())
    assert(e.getMessage.toLowerCase.contains("q"), e.getMessage)
  }

  test("RESTORE TABLE snaps back to an earlier version: metadata-only, history preserved") {
    warehouse
    val ST = graft.operators.SnapshotTable
    val root = s"$warehouse/rst"
    def parquets(): Set[String] =
      Files.list(java.nio.file.Paths.get(root)).iterator().asScala
        .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSet
    def ks(q: String): Seq[Long] =
      spark.sql(q).collect().map(_.getLong(0)).sorted.toSeq
    spark.sql("CREATE TABLE gcat.rst (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO gcat.rst VALUES (1, 1.0), (2, 2.0), (3, 3.0)") // v1
    spark.sql("DELETE FROM gcat.rst WHERE k <= 2") // v2: copy-on-write
    assert(ks("SELECT k FROM gcat.rst") == Seq(3L))
    val before = parquets()
    val v = spark.sql("RESTORE TABLE gcat.rst TO VERSION AS OF 1").head().getInt(0)
    assert(v == 3)
    // the deleted rows are back, and NOT ONE data file was written —
    // the restore commit re-lists v1's immutable files
    assert(ks("SELECT k FROM gcat.rst") == Seq(1L, 2L, 3L))
    assert(parquets() == before, "restore must be metadata-only")
    assert(ST.manifestEntries(root, 3).map(_.rel) == ST.manifestEntries(root, 1).map(_.rel))
    // the undone DELETE snapshot stays time-travelable, and a second
    // RESTORE redoes it
    assert(ks("SELECT k FROM gcat.rst VERSION AS OF 2") == Seq(3L))
    spark.sql("RESTORE TABLE gcat.rst TO VERSION AS OF 2") // v4
    assert(ks("SELECT k FROM gcat.rst") == Seq(3L))
    // each restore commit carries its own audit tag; tags don't leak
    // into the next commit's carried metadata
    assert(ST.manifestMeta(root, 3)("restore") == "v1")
    assert(ST.manifestMeta(root, 4)("restore") == "v2")
    // restoring to the current version is a no-op — no version minted
    // (path route: path≡name on the same directory)
    val cur = ST.currentVersion(root)
    assert(spark.sql(s"RESTORE TABLE '$root' TO VERSION AS OF $cur").head().getInt(0) == cur)
    assert(ST.currentVersion(root) == cur)
    // out-of-range target fails loudly
    val e1 = intercept[Exception](spark.sql("RESTORE TABLE gcat.rst TO VERSION AS OF 99"))
    assert(e1.getMessage.contains("no version 99"), e1.getMessage)
    // a vacuumed target is not restorable — loud error, table untouched
    spark.sql(s"VACUUM '$root' KEEP FROM 3").collect()
    val e2 = intercept[Exception](spark.sql("RESTORE TABLE gcat.rst TO VERSION AS OF 2"))
    assert(e2.getMessage.contains("vacuumed"), e2.getMessage)
    assert(ks("SELECT k FROM gcat.rst") == Seq(3L))
    // a non-graft identifier falls through to Spark's parser (which has
    // no RESTORE) instead of being claimed here
    val e3 = intercept[Exception](spark.sql("RESTORE TABLE nosuch.tbl TO VERSION AS OF 1"))
    assert(!e3.getMessage.contains("snapshot restore"), e3.getMessage)
  }

  test("RESTORE past an ALTER narrows the schema again; the wide snapshot stays wide") {
    warehouse
    val ST = graft.operators.SnapshotTable
    val root = s"$warehouse/rsw"
    spark.sql("CREATE TABLE gcat.rsw (k BIGINT)")
    spark.sql("INSERT INTO gcat.rsw VALUES (1), (2)") // v1
    spark.sql("ALTER TABLE gcat.rsw ADD COLUMN q DOUBLE") // v2: metadata-only
    spark.sql("INSERT INTO gcat.rsw VALUES (3, 3.5)") // v3: wide
    assert(spark.sql("SELECT * FROM gcat.rsw").columns.toSeq == Seq("k", "q"))
    spark.sql("RESTORE TABLE gcat.rsw TO VERSION AS OF 1") // v4
    // the restored state is the pre-ALTER table: narrow schema, narrow
    // content — the restore commit took v1's (absent) schema markers,
    // not the current version's capture
    assert(spark.sql("SELECT * FROM gcat.rsw").columns.toSeq == Seq("k"))
    assert(spark.sql("SELECT count(*) FROM gcat.rsw").head().getLong(0) == 2)
    assert(!ST.manifestMeta(root, 4).contains("schemaJson"))
    // the wide snapshot still time-travels wide
    assert(spark.sql("SELECT * FROM gcat.rsw VERSION AS OF 3").columns.toSeq == Seq("k", "q"))
    assert(spark.sql("SELECT q FROM gcat.rsw VERSION AS OF 3 WHERE k = 3").head().getDouble(0) == 3.5)
  }

  private def parquetsIn(dir: String): Set[String] =
    Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSet

  test("ALTER TABLE ADD COLUMNS applies multiple adds in ONE atomic commit; bad lists refuse whole") {
    warehouse
    val ST = graft.operators.SnapshotTable
    val root = s"$warehouse/mac"
    spark.sql("CREATE TABLE gcat.mac (k BIGINT)")
    spark.sql("INSERT INTO gcat.mac VALUES (1), (2)") // v1
    spark.sql("ALTER TABLE gcat.mac ADD COLUMNS (a DOUBLE, b STRING)") // ONE commit
    assert(ST.currentVersion(root) == 2, "multi-add must be one metadata commit")
    assert(spark.sql("SELECT * FROM gcat.mac").columns.toSeq == Seq("k", "a", "b"))
    assert(ST.manifestMeta(root, 2)("alter") == "addcol:a,b")
    // a list containing an unsupported type commits NOTHING — the
    // statement is atomic, so it is cleanly retryable after the fix
    val e = intercept[Exception](
      spark.sql("ALTER TABLE gcat.mac ADD COLUMNS (c DOUBLE, d TIMESTAMP)"))
    assert(e.getMessage.contains("unsupported added-column type"), e.getMessage)
    assert(ST.currentVersion(root) == 2, "half-applied ALTER detected")
    assert(!spark.sql("SELECT * FROM gcat.mac").columns.contains("c"))
    spark.sql("ALTER TABLE gcat.mac ADD COLUMNS (c DOUBLE, d DOUBLE)") // retry works
    assert(spark.sql("SELECT * FROM gcat.mac").columns.toSeq ==
      Seq("k", "a", "b", "c", "d"))
  }

  test("SHALLOW CLONE forks a table with zero data copy; DML diverges the fork only") {
    warehouse
    val ST = graft.operators.SnapshotTable
    val (srcRoot, cloneRoot) = (s"$warehouse/cs", s"$warehouse/cc")
    spark.sql("CREATE TABLE gcat.cs (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO gcat.cs VALUES (1, 1.0), (2, 2.0), (3, 3.0)") // src v1
    spark.sql("CREATE TABLE gcat.cc SHALLOW CLONE gcat.cs")
    // zero-copy: the clone directory holds NO data files; its manifest
    // re-lists the source's files by ../-relative reference
    assert(parquetsIn(cloneRoot).isEmpty, "clone must not copy data")
    assert(ST.manifestEntries(cloneRoot, 1).forall(_.rel.contains("..")))
    assert(spark.sql("SELECT count(*) FROM gcat.cc").head().getLong(0) == 3)
    // copy-on-write DML on the clone: rewrites land in the CLONE's
    // directory; the source's file set and content are bit-untouched
    val srcFiles = parquetsIn(srcRoot)
    spark.sql("DELETE FROM gcat.cc WHERE k <= 1") // clone v2
    assert(parquetsIn(srcRoot) == srcFiles, "clone DML wrote into the source dir")
    assert(spark.sql("SELECT count(*) FROM gcat.cs").head().getLong(0) == 3)
    assert(spark.sql("SELECT k FROM gcat.cc ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(2L, 3L))
    assert(parquetsIn(cloneRoot).nonEmpty, "the rewrite must land clone-local files")
    // the clone has its own history: v1 still reads the pre-DML fork
    assert(spark.sql("SELECT count(*) FROM gcat.cc VERSION AS OF 1").head().getLong(0) == 3)
    // appends land clone-local too; the source count never moves
    spark.sql("INSERT INTO gcat.cc VALUES (9, 9.0)")
    assert(spark.sql("SELECT count(*) FROM gcat.cc").head().getLong(0) == 3)
    assert(spark.sql("SELECT count(*) FROM gcat.cs").head().getLong(0) == 3)
    assert(parquetsIn(srcRoot) == srcFiles)
    // vacuum on the CLONE reclaims only clone-local garbage — the
    // referenced source files are outside its directory by construction
    spark.sql(s"VACUUM '$cloneRoot' KEEP FROM ${ST.currentVersion(cloneRoot)}").collect()
    assert(parquetsIn(srcRoot) == srcFiles, "clone vacuum touched source files")
    assert(spark.sql("SELECT count(*) FROM gcat.cc").head().getLong(0) == 3)
  }

  test("SHALLOW CLONE VERSION AS OF forks a historical snapshot; refusals are loud") {
    warehouse
    val ST = graft.operators.SnapshotTable
    spark.sql("CREATE TABLE gcat.cvs (k BIGINT)")
    spark.sql("INSERT INTO gcat.cvs VALUES (1), (2)") // v1
    spark.sql("INSERT INTO gcat.cvs VALUES (3)") // v2
    spark.sql("CREATE TABLE gcat.cv1 SHALLOW CLONE gcat.cvs VERSION AS OF 1")
    assert(spark.sql("SELECT count(*) FROM gcat.cv1").head().getLong(0) == 2)
    assert(ST.manifestMeta(s"$warehouse/cv1", 1)("clone").endsWith("@v1"))
    // an existing table refuses to be clobbered by a clone
    val e1 = intercept[Exception](
      spark.sql("CREATE TABLE gcat.cv1 SHALLOW CLONE gcat.cvs"))
    assert(e1.getMessage.contains("already a committed table"), e1.getMessage)
    // an out-of-range source version fails loudly
    val e2 = intercept[Exception](
      spark.sql("CREATE TABLE gcat.cv9 SHALLOW CLONE gcat.cvs VERSION AS OF 9"))
    assert(e2.getMessage.contains("no version 9"), e2.getMessage)
  }

  test("SHALLOW CLONE of an evolved source carries schema markers: union width, null-fill") {
    warehouse
    spark.sql("CREATE TABLE gcat.ces (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO gcat.ces VALUES (1, 1.0), (2, 2.0)") // v1 narrow
    spark.sql("ALTER TABLE gcat.ces ADD COLUMN q DOUBLE") // v2 metadata-only
    spark.sql("INSERT INTO gcat.ces VALUES (3, 3.0, 0.5)") // v3 wide
    spark.sql("CREATE TABLE gcat.cec SHALLOW CLONE gcat.ces")
    assert(spark.sql("SELECT * FROM gcat.cec").columns.toSeq == Seq("k", "v", "q"))
    assert(spark.sql("SELECT k FROM gcat.cec WHERE q IS NULL ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(spark.sql("SELECT q FROM gcat.cec WHERE k = 3").head().getDouble(0) == 0.5)
  }

  test("column DEFAULTs: CREATE-time fill, DEFAULT keyword, re-point, drop, carry (x46, r16)") {
    warehouse
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS gcat.cd")
    spark.sql("CREATE TABLE gcat.cd (k BIGINT, v DOUBLE, " +
      "src STRING DEFAULT 'organic', boost DOUBLE DEFAULT 1.5)")
    // the pre-first-commit window already fills (schema metadata)
    spark.sql("INSERT INTO gcat.cd (k, v) VALUES (1, 10.0)")
    // and the manifest now carries the state (the pending marker applied)
    val root = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.gcat.root"), "cd").toString
    val ST = graft.operators.SnapshotTable
    assert(ST.columnDefaults(root, ST.currentVersion(root)) ==
      Map("src" -> "'organic'", "boost" -> "1.5"),
      ST.columnDefaults(root, ST.currentVersion(root)).toString)
    // post-commit fills come off the re-attached metadata
    spark.sql("INSERT INTO gcat.cd (k, v) VALUES (2, 20.0)")
    spark.sql("INSERT INTO gcat.cd VALUES (3, 30.0, 'paid', DEFAULT)")
    val got = spark.sql("SELECT k, src, boost FROM gcat.cd ORDER BY k")
      .as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "organic", 1.5), (2L, "organic", 1.5),
      (3L, "paid", 1.5)), got.toString)
    // SHOW TBLPROPERTIES surfaces the state
    val props = spark.sql("SHOW TBLPROPERTIES gcat.cd")
      .as[(String, String)].collect().toMap
    assert(props.get("default.src").contains("'organic'"), props.toString)
    // ALTER ... SET DEFAULT re-points for LATER inserts only
    spark.sql("ALTER TABLE gcat.cd ALTER COLUMN src SET DEFAULT 'late'")
    spark.sql("INSERT INTO gcat.cd (k, v) VALUES (4, 40.0)")
    val after = spark.sql("SELECT k, src FROM gcat.cd ORDER BY k")
      .as[(Long, String)].collect().toMap
    assert(after(4L) == "late" && after(1L) == "organic",
      s"re-pointed default must not backfill: $after")
    // DROP DEFAULT: the fill stops (Spark then refuses the omission)
    spark.sql("ALTER TABLE gcat.cd ALTER COLUMN src DROP DEFAULT")
    assert(!ST.columnDefaults(root, ST.currentVersion(root)).contains("src"))
    // refusals: non-deterministic (Spark's own analyzer gate), a
    // non-constant column reference (our foldable gate, reachable on
    // the path-SQL property route that has no analyzer pre-check),
    // default on a generated column
    val e1 = intercept[Exception](spark.sql(
      "ALTER TABLE gcat.cd ALTER COLUMN v SET DEFAULT rand()").collect())
    assert(e1.getMessage.contains("non-deterministic"), e1.toString)
    val e1b = intercept[Exception](spark.sql(
      s"ALTER TABLE '$root' SET TBLPROPERTIES ('default.v' = 'k + 1')").collect())
    assert(e1b.getMessage.contains("constant") ||
      Option(e1b.getCause).exists(_.getMessage.contains("constant")), e1b.toString)
    spark.sql(s"ALTER TABLE '$root' SET TBLPROPERTIES ('gen.v' = 'k * 10.0')")
    val e2 = intercept[Exception](spark.sql(
      "ALTER TABLE gcat.cd ALTER COLUMN v SET DEFAULT 0.0").collect())
    assert(e2.getMessage.contains("GENERATED"), e2.getMessage)
    // the path-SQL property spelling attaches too; clone carries
    spark.sql(s"ALTER TABLE '$root' SET TBLPROPERTIES ('default.boost' = '2.5')")
    assert(ST.columnDefaults(root, ST.currentVersion(root))("boost") == "2.5")
    val cl = graft.operators.Engine.tmpDir("graft_cd_clone")
    graft.operators.Engine.listDir(java.nio.file.Paths.get(cl))
      .foreach(graft.operators.Engine.deleteRecursively)
    ST.shallowClone(root, cl)
    assert(ST.columnDefaults(cl, ST.currentVersion(cl))("boost") == "2.5",
      "clone must carry column defaults")
    // the writer feature stamps (a defaults-ignorant binary's catalog
    // would land NULLs where the declared contract says the default)
    assert(ST.manifestMeta(root, ST.currentVersion(root))("writerFeatures")
      .split(',').contains("coldefaults"),
      ST.manifestMeta(root, ST.currentVersion(root)).toString)
  }

  test("DEFAULTs travel with their column through RENAME and die with DROP (r16 review)") {
    warehouse
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS gcat.cdm")
    spark.sql("CREATE TABLE gcat.cdm (k BIGINT, v DOUBLE, " +
      "src STRING DEFAULT 'organic')")
    spark.sql("INSERT INTO gcat.cdm (k, v) VALUES (1, 1.0)")
    val root = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.gcat.root"), "cdm").toString
    val ST = graft.operators.SnapshotTable
    // RENAME re-homes the default under the new name; the fill keeps
    // working (a stale `default.src` key would silently detach it)
    spark.sql("ALTER TABLE gcat.cdm RENAME COLUMN src TO origin")
    val ds = ST.columnDefaults(root, ST.currentVersion(root))
    assert(ds == Map("origin" -> "'organic'"), ds.toString)
    spark.sql("INSERT INTO gcat.cdm (k, v) VALUES (2, 2.0)")
    val got = spark.sql("SELECT k, origin FROM gcat.cdm ORDER BY k")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "organic"), (2L, "organic")), got.toString)
    // DROP removes the key — a later re-ADD of the same logical name
    // must NOT resurrect the years-old fill
    spark.sql("ALTER TABLE gcat.cdm DROP COLUMN origin")
    assert(ST.columnDefaults(root, ST.currentVersion(root)).isEmpty)
    spark.sql("ALTER TABLE gcat.cdm ADD COLUMN origin STRING")
    assert(ST.columnDefaults(root, ST.currentVersion(root)).isEmpty,
      "re-added column resurrected a dropped DEFAULT")
    // ADD COLUMN ... DEFAULT refuses loudly instead of silently
    // dropping the clause (existing rows would not take the default)
    val e = intercept[Exception](spark.sql(
      "ALTER TABLE gcat.cdm ADD COLUMN flag DOUBLE DEFAULT 1.0").collect())
    assert(e.getMessage.contains("ADD COLUMN ... DEFAULT is not supported"),
      e.getMessage)
  }

  test("a CREATE-time DEFAULT on a column the seed omits stays PENDING, never fails the landed commit (r16 review)") {
    warehouse
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS gcat.cdp")
    spark.sql("CREATE TABLE gcat.cdp (k BIGINT, src STRING DEFAULT 'o')")
    val root = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.catalog.gcat.root"), "cdp").toString
    val ST = graft.operators.SnapshotTable
    // seed through the sink with a NARROWER frame (no src): the batch
    // must report success (its commit landed) and the declaration must
    // stay pending instead of being lost or throwing
    assert(graft.streaming.SnapshotSink.appendBatch(root,
      Seq(Tuple1(1L)).toDF("k"), batchId = 0L, keyCol = "k"))
    assert(ST.pendingDefaults(root) == Map("src" -> "'o'"),
      "narrow seed must keep the declaration pending")
    assert(ST.read(spark, root).count() == 1)
    assert(ST.columnDefaults(root, ST.currentVersion(root)).isEmpty)
    // a catalog ADD COLUMN that makes the declared column resident
    // applies the pending declaration ON THAT COMMIT (r16 ADVICE:
    // previously only data commits triggered the apply, leaving a
    // window where column-list INSERTs landed NULL where the
    // CREATE-declared DEFAULT promised a fill)
    spark.sql("ALTER TABLE gcat.cdp ADD COLUMN src STRING")
    assert(ST.pendingDefaults(root).isEmpty,
      "the widening that made the column resident must apply the declaration")
    assert(ST.columnDefaults(root, ST.currentVersion(root)) == Map("src" -> "'o'"))
    spark.sql("INSERT INTO gcat.cdp (k) VALUES (2)")
    val filled = spark.sql("SELECT src FROM gcat.cdp WHERE k = 2")
      .collect().head.getString(0)
    assert(filled == "o", s"the first post-widening INSERT must take the fill: $filled")
  }

  test("optimizewrite: the DSv2 write re-clusters an interleaved INSERT in flight") {
    warehouse
    val ST = graft.operators.SnapshotTable
    def newRanges(root: String): Seq[(Long, Long)] = {
      val v = ST.currentVersion(root)
      val before = ST.manifestEntries(root, v - 1).map(_.rel).toSet
      ST.manifestEntries(root, v).filterNot(e => before(e.rel)).map(e => (e.lo, e.hi))
    }
    def fixture(name: String, clustered: Boolean): String = {
      spark.sql(s"DROP TABLE IF EXISTS gcat.$name")
      spark.sql(s"""CREATE TABLE gcat.$name AS
        SELECT CAST(id % 8 AS BIGINT) AS k, CAST(id AS DOUBLE) AS v FROM range(0, 400)""")
      spark.sql(s"OPTIMIZE gcat.$name CLUSTER BY (k) TARGET 4")
      if (clustered)
        spark.sql(s"ALTER TABLE gcat.$name SET TBLPROPERTIES ('optimizewrite'='on')")
      // the tail arrives deliberately key-INTERLEAVED across 8 tasks
      spark.sql(s"""INSERT INTO gcat.$name
        SELECT /*+ REPARTITION(8) */ CAST(id % 8 AS BIGINT), CAST(id + 1000 AS DOUBLE)
        FROM range(0, 400)""")
      s"$warehouse/$name"
    }
    // control: without the flag every interleaved task writes the full
    // key range — the landed files all overlap
    val plain = fixture("ow_plain", clustered = false)
    val plainRanges = newRanges(plain)
    assert(plainRanges.forall { case (lo, hi) => lo == 0 && hi == 7 },
      s"control fixture must land full-range files, got $plainRanges")
    // clustered: the ordered distribution re-partitions in flight —
    // landed files carry pairwise-DISJOINT ranges. At test scale AQE
    // would rightly coalesce the 400-row shuffle to ONE partition
    // (size-proportional files are the production behavior); pin
    // coalescing off so the fan-out itself is observable.
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val coalesceWas = spark.conf.get(coalesceKey)
    val ow = try {
      spark.conf.set(coalesceKey, "false")
      fixture("ow", clustered = true)
    } finally spark.conf.set(coalesceKey, coalesceWas)
    val ranges = newRanges(ow)
    assert(ranges.size > 1, s"expected a fan-out of clustered files, got $ranges")
    assert(ranges.combinations(2).forall {
      case Seq((lo1, hi1), (lo2, hi2)) => hi1 < lo2 || hi2 < lo1
    }, s"clustered write must land disjoint key ranges, got $ranges")
    // the layout pays off immediately: a point read opens fewer files
    val v = ST.currentVersion(ow)
    assert(ST.prunedEntries(ow, v, 3L, 3L).size < ST.manifestEntries(ow, v).size,
      "post-insert point read must prune")
    // content is shuffle-invisible
    assert(spark.sql("SELECT count(*), sum(v) FROM gcat.ow").head() ==
      spark.sql("SELECT count(*), sum(v) FROM gcat.ow_plain").head())
    // a stats-less table refuses the flag: there is nothing to cluster on
    spark.sql("DROP TABLE IF EXISTS gcat.ow_nostats")
    spark.sql("CREATE TABLE gcat.ow_nostats (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO gcat.ow_nostats VALUES (1, 1.0)")
    val e = intercept[Exception](
      spark.sql("ALTER TABLE gcat.ow_nostats SET TBLPROPERTIES ('optimizewrite'='on')"))
    assert(e.getMessage.contains("stats"), e.getMessage)
  }
}
