package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** x26's ingest-client contracts the gate fixture keeps deterministic:
  * quota survival (429 + backoff, no lost pages), real pagination, and
  * the late-data re-pull (a revised day SUPERSEDES its partition —
  * never duplicates, never leaks into other days). */
class ApiIngestSpec extends AnyFunSuite {
  import TestSession._
  val Engine = graft.operators.Engine

  test("pull survives quota throttling and pagination with zero lost rows") {
    val (server, days) = Engine.x26Serve(spark, sf)
    try {
      val warehouse = Engine.tmpDir("graft_x26_spec_wh")
      Engine.listDir(java.nio.file.Paths.get(warehouse))
        .foreach(Engine.deleteRecursively)
      Engine.x26Land(spark, server.port, warehouse, days)
      // the fixture genuinely paginated and throttled — otherwise this
      // spec proves nothing about the client
      assert(server.requestCount > days.size,
        s"no pagination: ${server.requestCount} requests for ${days.size} days")
      assert(server.throttleCount > 0, "quota path never exercised")
      val got = spark.read.parquet(warehouse).count()
      val want = graft.sources.Tables.events(spark, sf).count()
      assert(got == want, s"pull lost/duplicated rows: $got vs $want")
    } finally server.stop()
  }

  test("x27 avro round-trip is row-lossless including nulls and every supported type") {
    import spark.implicits._
    val src = Seq(
      (1L, Some("a,b\"c"), Some(1.5), Some(7)),
      (2L, None, Some(-0.0), None),
      (3L, Some(""), None, Some(Int.MinValue)),
      (Long.MaxValue, Some("π — unicode"), Some(Double.MinPositiveValue), Some(0)))
      .toDF("id", "s", "v", "n")
    val dir = Engine.tmpDir("graft_x27_spec")
    Engine.avroWrite(src.repartition(3), dir)
    val back = Engine.avroRead(spark, dir, src.schema)
    assert(back.schema == src.schema)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty,
      "avro round-trip altered rows")
    // distributed write shape: one container per task partition
    val files = Engine.listDir(java.nio.file.Paths.get(dir))
      .count(_.getFileName.toString.endsWith(".avro"))
    assert(files == 3, s"expected one container per partition, got $files")
    // unsupported column types are refused loudly, not mis-encoded
    val e = intercept[RuntimeException](
      Engine.avroWrite(Seq((1L, Array(1.0f))).toDF("id", "emb"), dir))
    assert(e.getMessage.contains("unsupported type"))
  }

  test("re-pull of a REVISED day supersedes its partition exactly") {
    val (server, days) = Engine.x26Serve(spark, sf)
    try {
      val warehouse = Engine.tmpDir("graft_x26_spec_rev")
      Engine.listDir(java.nio.file.Paths.get(warehouse))
        .foreach(Engine.deleteRecursively)
      Engine.x26Land(spark, server.port, warehouse, days)
      val before = spark.read.parquet(warehouse)
        .groupBy(col("ep_day").cast("long").as("d")).count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // the API finalizes the newest day: half the events drop out and
      // one correction row appears (id -1)
      val day = days.max
      val revised = graft.sources.Tables.events(spark, sf)
        .withColumn("ep_day", expr("(ts div 1000000000) div 86400"))
        .filter(col("ep_day") === day && col("event_id") % 2 === 0)
        .select("event_id", "user_id", "event_type", "value", "ep_day")
        .collect().map(Engine.x26Json).toIndexedSeq :+
        s"""{"event_id":-1,"user_id":1,"event_type":"corr","value":0.5,"ep_day":$day}"""
      server.revise(day, revised)
      Engine.x26Land(spark, server.port, warehouse, Seq(day))
      val after = spark.read.parquet(warehouse)
        .groupBy(col("ep_day").cast("long").as("d")).count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(after(day) == revised.size,
        s"revised day not superseded: ${after(day)} rows vs ${revised.size} served")
      assert((after - day) == (before - day), "re-pull disturbed other days' partitions")
      assert(spark.read.parquet(warehouse)
        .filter(col("event_id") === -1L).count() == 1, "correction row missing")
    } finally server.stop()
  }
}
