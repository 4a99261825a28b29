package graft

import org.apache.spark.sql.SparkSession

/** Production session factory: one place for the configs every graft
  * deployment wants — AQE (with skew-join handling), UTC semantics,
  * graft's SQL extensions. `shufflePartitions` should track cluster
  * parallelism (local[N] → N; a 1000-executor cluster → executors ×
  * cores × 2-3, or rely on AQE coalescing from a higher initial value).
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // let the planner pick shuffled-hash over sort-merge when the
      // per-partition build side fits (skips both sort passes), and let
      // AQE convert a planned SMJ to SHJ at runtime when every
      // post-shuffle partition is under the threshold. Two distinct
      // mechanisms (ADVICE r21): the preferSortMergeJoin=false pick is
      // ESTIMATE-based (canBuildLocalHashMap on stats — a bad estimate
      // can overcommit build-side memory, the classic SHJ risk, though
      // SHJ spills in Spark 3.1+ so the failure mode is spill, not a
      // hard OOM), while only the AQE threshold conversion is sized
      // from RUNTIME shuffle statistics. The join result is identical
      // either way; only the physical strategy changes.
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)

  def build(master: String, shufflePartitions: Int): SparkSession = {
    val s = builder(master, shufflePartitions).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
