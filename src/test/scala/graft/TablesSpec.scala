package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The events loader contract: ts surfaces as nanos-since-epoch LONG
  * whichever parquet vintage the driver corpus ships — TIMESTAMP(NANOS)
  * (read as a raw long via the nanosAsLong legacy conf) or
  * TIMESTAMP(MICROS) (read as a timestamp, normalized at the seam). The
  * r11 corpus regeneration flipped NANOS→MICROS and silently broke
  * every `ts div 1e9` plan until Tables.normalizeTs pinned the
  * contract; this spec keeps either vintage readable. */
class TablesSpec extends AnyFunSuite {
  import TestSession._

  test("events.ts surfaces as nanos LONG from the mounted corpus") {
    val ev = graft.sources.Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == org.apache.spark.sql.types.LongType)
    // nanos scale: corpus instants are ~1.7e18 ns, not seconds/micros
    val r = ev.agg(min("ts"), max("ts")).head()
    assert(r.getLong(0) > 100000000000000000L && r.getLong(1) < 4000000000000000000L,
      s"ts not at nanos scale: ${r.getLong(0)}..${r.getLong(1)}")
  }

  test("normalizeTs converts timestamp ts exactly (µs × 1000) and passes longs through") {
    import spark.implicits._
    val tsDf = Seq("2026-01-02 03:04:05.123456")
      .toDF("s").select(to_timestamp(col("s")).cast("timestamp_ntz").as("ts"))
    val n = graft.sources.Tables.normalizeTs(tsDf)
    assert(n.schema("ts").dataType == org.apache.spark.sql.types.LongType)
    assert(n.head().getLong(0) == 1767323045123456000L)
    val longDf = Seq(42L).toDF("ts")
    assert(graft.sources.Tables.normalizeTs(longDf) eq longDf,
      "a long-typed ts must pass through untouched")
  }

  test("normalizeTs refuses an NTZ ts under a non-UTC session (ADVICE r11)") {
    import spark.implicits._
    val tsDf = Seq("2026-01-02 03:04:05.123456")
      .toDF("s").select(to_timestamp(col("s")).cast("timestamp_ntz").as("ts"))
    val saved = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val e = intercept[IllegalArgumentException] {
        graft.sources.Tables.normalizeTs(tsDf)
      }
      assert(e.getMessage.contains("session time zone"), e.getMessage)
    } finally spark.conf.set("spark.sql.session.timeZone", saved)
  }
}
