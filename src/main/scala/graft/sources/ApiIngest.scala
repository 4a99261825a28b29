package graft.sources

import java.net.{HttpURLConnection, InetSocketAddress, URI}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicLong

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** A fixture HTTP API with the GA-Core-Reporting ingest shape
  * (SURVEY §1 step 1): day-scoped, PAGINATED, QUOTA-LIMITED pulls.
  *
  *   GET /events?day=<epoch_day>&page=<n>
  *     → 200, NDJSON body (one event per line), header
  *       `X-Next-Page: <n+1>` present iff more pages remain
  *     → 429 + `Retry-After: 0` on every `quotaEvery`-th request
  *       (deterministic throttle injection — the client's backoff path
  *       runs in every test, not just under real quota pressure)
  *
  * Day content is mutable via [[revise]] — the late-finalized-data
  * property of analytics APIs that forces re-pull semantics on any
  * correct ingest client. The server is a test double for the external
  * system (it serves from memory on an ephemeral localhost port); the
  * puller under test ([[ApiIngest]]) is the production-shaped code. */
private[graft] final class ApiFixtureServer(
    initial: Map[Long, IndexedSeq[String]], val pageSize: Int,
    quotaEvery: Int) {

  private val data = new java.util.concurrent.ConcurrentHashMap[Long, IndexedSeq[String]]
  initial.foreach { case (k, v) => data.put(k, v) }

  private val requests = new AtomicLong
  private val throttles = new AtomicLong
  def requestCount: Long = requests.get
  def throttleCount: Long = throttles.get

  /** Replace one day's content — the "API finalized yesterday" event. */
  def revise(day: Long, lines: IndexedSeq[String]): Unit = data.put(day, lines)

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  // daemon threads + explicit shutdown in stop(): HttpServer.stop does
  // NOT shut down a user-supplied executor, and non-daemon pool threads
  // would pin the JVM at exit (the r12 hang this comment memorializes)
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8,
    (r: Runnable) => { val t = new Thread(r, "graft-api-fixture"); t.setDaemon(true); t })
  server.setExecutor(pool)
  server.createContext("/events", (ex: HttpExchange) => {
    try {
      val n = requests.incrementAndGet()
      if (quotaEvery > 0 && n % quotaEvery == 0) {
        throttles.incrementAndGet()
        ex.getResponseHeaders.set("Retry-After", "0")
        ex.sendResponseHeaders(429, -1)
      } else {
        val q = Option(ex.getRequestURI.getQuery).getOrElse("")
        val params = q.split("&").filter(_.contains("="))
          .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap
        val day = params("day").toLong
        val page = params.getOrElse("page", "0").toInt
        val lines = Option(data.get(day)).getOrElse(IndexedSeq.empty)
        val slice = lines.slice(page * pageSize, (page + 1) * pageSize)
        if ((page + 1) * pageSize < lines.size)
          ex.getResponseHeaders.set("X-Next-Page", (page + 1).toString)
        val body = slice.mkString("\n").getBytes(UTF_8)
        ex.sendResponseHeaders(200, if (body.isEmpty) -1 else body.length.toLong)
        if (body.nonEmpty) ex.getResponseBody.write(body)
      }
    } finally ex.close()
  })
  server.start()
  def port: Int = server.getAddress.getPort
  def stop(): Unit = { server.stop(0); pool.shutdownNow(); () }
}

/** The ingest CLIENT — production-shaped: one paginated pull per day
  * with bounded exponential backoff on quota responses. Distribution
  * shape: the day list is a Dataset and each PARTITION of days pulls
  * through this client inside `mapPartitions` (the Spark-JDBC
  * partitioned-read pattern) — day-sharded across executors, each day's
  * page chain sequential as the API requires. */
private[graft] object ApiIngest {

  private val MaxAttempts = 12

  /** All NDJSON lines of one day, following `X-Next-Page` until the
    * server stops sending it; a 429 sleeps `20ms × attempt` (bounded,
    * fail-loud past MaxAttempts) and retries the SAME page. */
  def pullDay(base: String, day: Long): Iterator[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var page = 0
    var more = true
    while (more) {
      var attempt = 0
      var done = false
      while (!done) {
        val conn = URI.create(s"$base/events?day=$day&page=$page")
          .toURL.openConnection().asInstanceOf[HttpURLConnection]
        try {
          conn.getResponseCode match {
            case 200 =>
              val body = new String(conn.getInputStream.readAllBytes(), UTF_8)
              if (body.nonEmpty) out ++= body.split("\n")
              more = conn.getHeaderField("X-Next-Page") != null
              page += 1
              done = true
            case 429 =>
              attempt += 1
              require(attempt < MaxAttempts,
                s"api ingest: day $day page $page still throttled after $MaxAttempts attempts")
              Thread.sleep(20L * attempt)
            case other =>
              throw new IllegalStateException(
                s"api ingest: day $day page $page returned HTTP $other")
          }
        } finally conn.disconnect()
      }
    }
    out.iterator
  }
}
