package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Session-scoped memo for expensive derived values (checkpointed label
  * frames, fitted models) that several operators share within one
  * session. Entries are keyed by (session, key) and evicted when the
  * session's SparkContext ends, so a long-lived JVM hosting many
  * sessions never pins dead RDD blocks or model references. Keys must
  * identify immutable inputs (the harness never regenerates a testdata
  * dir in place). */
final class SessionMemo[V] {
  private val memo = TrieMap.empty[(SparkSession, String), V]
  private val hooked = TrieMap.empty[SparkSession, Boolean]

  def getOrElseUpdate(s: SparkSession, key: String)(value: => V): V = {
    hooked.getOrElseUpdate(s, {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          memo.filterInPlace { case ((sess, _), _) => sess ne s }
          hooked.remove(s)
        }
      })
      true
    })
    memo.getOrElseUpdate((s, key), value)
  }

  /** Visible for tests: live entries for a session. */
  private[graft] def liveKeys(s: SparkSession): Set[String] =
    memo.keys.collect { case (sess, k) if sess eq s => k }.toSet
}
