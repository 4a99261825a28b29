package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Transport-independence at the row level: the Kafka path's only
  * transport-specific transform (wire record → typed row, in
  * [[graft.streaming.KafkaStreamSource.parse]]) reproduces exactly the
  * rows the file transport delivers, over frames in Kafka's exact wire
  * schema. No broker exists in this container; this pins the one seam
  * the broker would sit behind. */
class KafkaParitySpec extends AnyFunSuite {
  import TestSession._

  test("kafka wire frames parse to the same rows the file transport delivers") {
    val ev = graft.sources.Tables.events(spark, sf)
      .withColumn("ep_day", expr("(ts div 1000000000) div 86400"))
      .select("event_id", "user_id", "event_type", "value", "ep_day")
      .limit(500)
    val schema = ev.schema
    // Kafka's wire schema, exactly as format("kafka").load() yields it:
    // the producer writes one JSON event per record value — the recipe
    // KafkaStreamSource documents
    val wire = ev.select(
      lit(null).cast("binary").as("key"),
      to_json(struct(ev.columns.map(col).toIndexedSeq: _*)).cast("binary").as("value"),
      lit("events").as("topic"),
      lit(0).as("partition"),
      monotonically_increasing_id().as("offset"),
      current_timestamp().as("timestamp"),
      lit(0).as("timestampType"))
    val parsed = graft.streaming.KafkaStreamSource.parse(wire, schema)
    // same columns and types (from_json relaxes nullability — irrelevant
    // to row content), same rows bit-for-bit (longs exact; doubles
    // round-trip through Jackson's shortest-representation printing)
    assert(parsed.columns.toSeq == ev.columns.toSeq)
    assert(parsed.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(parsed.count() == 500)
    assert(parsed.except(ev).isEmpty && ev.except(parsed).isEmpty,
      "kafka-parsed rows drifted from the file-transport rows")
  }

  test("st4's full watermark/late-data plan runs end-to-end over a recorded Kafka wire feed") {
    val S = graft.streaming.Streams
    // the same operator, twice: once over the file transport (the gate
    // fixture), once over wire-format record batches deserialized
    // through KafkaStreamSource.parse — the complete broker path minus
    // the socket. Identical emitted windows = the operator plan is
    // transport-independent where it matters: watermark advance, state
    // eviction, and the guaranteed late-row drop all behave the same.
    val file = S.st4StreamLateData(spark, sf).collect().map(_.toString).toSeq
    val wire = S.withSource(graft.streaming.KafkaWireReplaySource) {
      S.st4StreamLateData(spark, sf)
    }.collect().map(_.toString).toSeq
    assert(file.nonEmpty, "st4 fixture emitted nothing")
    assert(wire == file, s"wire-fed st4 drifted: ${wire.take(2)} vs ${file.take(2)}")
  }

  test("st6's per-key session state machine runs end-to-end over a recorded Kafka wire feed") {
    val S = graft.streaming.Streams
    val file = S.st6StreamSessionState(spark, sf).collect().map(_.toString).toSeq
    val wire = S.withSource(graft.streaming.KafkaWireReplaySource) {
      S.st6StreamSessionState(spark, sf)
    }.collect().map(_.toString).toSeq
    assert(file.nonEmpty, "st6 fixture emitted nothing")
    assert(wire == file, s"wire-fed st6 drifted: ${wire.take(2)} vs ${file.take(2)}")
  }

  test("malformed records surface as null-field rows, not a crashed query") {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, sf).limit(1)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType)))
    val wire = Seq("not json at all", """{"event_id": 7}""").toDF("s")
      .select(col("s").cast("binary").as("value"))
    val parsed = graft.streaming.KafkaStreamSource.parse(wire, schema).collect()
    assert(parsed.length == 2)
    assert(parsed.exists(r => !r.isNullAt(0) && r.getLong(0) == 7L))
    assert(parsed.exists(_.isNullAt(0)), "malformed record should yield null fields")
    assert(ev.count() == 1) // touch ev so the events reader stays exercised
  }
}
