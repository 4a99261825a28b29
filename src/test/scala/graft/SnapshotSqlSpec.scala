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
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(h.map(_._1).toSeq == Seq(1, 2))
    assert(h(0)._2 == 3 && h(1)._2 == 2, s"file counts wrong: ${h.toSeq}")
    assert(h(0)._3 == h(1)._3 && h(0)._3 == 300, "row counts drifted across the rewrite")
    assert(h(0)._4.contains("statsCol=ep_day"))
    assert(h(1)._4.contains("optimize=clustered:ep_day") && h(1)._4.contains("statsCol=ep_day"))
  }

  test("an unparseable statement fails loudly with the grammar in the message") {
    val e = intercept[IllegalArgumentException](
      Sql.exec(spark, "DROP TABLE students"))
    assert(e.getMessage.contains("OPTIMIZE") && e.getMessage.contains("MERGE INTO"))
  }
}
