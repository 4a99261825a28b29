package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** m6 (RGB + JPEG codec path) and m7 (PCM audio chunking) contracts:
  * closed-form fixtures through the REAL javax.imageio codecs and exact
  * integer sample math. */
class RgbAudioSpec extends AnyFunSuite {
  import TestSession._
  val M = graft.operators.Multimodal

  test("m6: solid-color RGB round-trips PNG exactly; JPEG keeps dims, bounded distortion") {
    val w = M.M6Width
    // 2 full rows of solid (200, 100, 50)
    val bytes = Array.fill(2 * w)(Array(200.toByte, 100.toByte, 50.toByte)).flatten
    val img = M.toRgbImage(bytes)
    assert(img.getWidth == w && img.getHeight == 2)
    val (pw, pr) = M.pngCodec
    val (jw, jr) = M.jpegCodec
    val png = M.readImage(M.writeImage(img, pw), pr)
    val (r, g, b, n) = M.channelSums(png)
    assert(n == 2L * w)
    // PNG is lossless: channel means are the planted constants exactly
    assert(r.toDouble / n == 200.0 && g.toDouble / n == 100.0 && b.toDouble / n == 50.0)
    val jpg = M.readImage(M.writeImage(img, jw), jr)
    assert(jpg.getWidth == w && jpg.getHeight == 2, "JPEG changed dimensions")
    // a solid-color block is JPEG's best case: tiny distortion, not zero
    // guaranteed (quantization), so bound it
    assert(M.meanAbsDiff(png, jpg) < 4.0, "JPEG distortion out of bounds for a solid block")
  }

  test("m7: square-wave PCM has closed-form RMS and zero crossings") {
    // alternating +1000/-1000 per sample: RMS = 1000 exactly, and a
    // crossing at every sample boundary = M7ChunkSamples - 1
    val samples = Array.tabulate(M.M7ChunkSamples)(i =>
      if (i % 2 == 0) 1000.toShort else (-1000).toShort)
    val (rms, zc) = M.pcmChunkFeatures(samples)
    assert(rms == 1000.0 && zc == M.M7ChunkSamples - 1)
    // DC signal: RMS = level, zero crossings
    val dc = Array.fill(M.M7ChunkSamples)(700.toShort)
    val (rms2, zc2) = M.pcmChunkFeatures(dc)
    assert(rms2 == 700.0 && zc2 == 0L)
  }

  test("m6/m7 run the corpus deterministically with independently-recomputed row counts") {
    val m6 = SparkEntry.queries("m6_rgb_jpeg_stats")(spark, sf)
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(m6.count() == nDocs, "m6 must emit one row per document")
    val a = m6.collect().map(_.toSeq)
    val b = SparkEntry.queries("m6_rgb_jpeg_stats")(spark, sf).collect().map(_.toSeq)
    assert(a.sameElements(b), "m6 not deterministic")
    // m7: chunk counts recomputed independently from payload lengths
    val expected = graft.sources.Tables.documents(spark, sf)
      .filter(pmod(col("doc_id"), lit(3)) === 1) // the audio/wav docs
      .select(sum(expr(s"(length(text) div 2) div ${M.M7ChunkSamples}")))
      .head().getLong(0)
    val m7 = SparkEntry.queries("m7_audio_chunks")(spark, sf)
    assert(m7.count() == expected, "m7 chunk fan-out drifted from payload lengths")
    assert(m7.count() > 0, "fixture produced no audio chunks")
  }
}
