package graft.ingest

import graft.SparkTestBase
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

/** Real-socket exercise of the S5 retry/backoff/skip ladder: a loopback
  * `com.sun.net.httpserver` listener serves the fixtures with injected
  * 500s and read-timeout stalls, and [[HttpFetcher]] +
  * [[Fetch.fetchPartitioned]] run against it — so the HTTP client,
  * status handling, and timeout paths are verified over actual TCP, not
  * a fake Fetcher (egress is sandbox-blocked; loopback is not).
  */
class HttpFetcherSpec extends SparkTestBase
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  private var server: HttpServer = _
  private var base: String = _
  private val flakyHits = new AtomicInteger(0)

  private def handler(f: HttpExchange => Unit): HttpHandler =
    (ex: HttpExchange) => try f(ex) finally ex.close()

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/ok", handler(respond(_, 200,
      """{"forecast":{"forecastday":[{"date":"2026-01-09",""" +
        """"day":{"totalprecip_in":0.42,"avgtemp_f":51.3}}]}}""")))
    // first request 500s, every later one succeeds — the retry target
    server.createContext("/flaky", handler { ex =>
      if (flakyHits.getAndIncrement() == 0) respond(ex, 500, "boom")
      else respond(ex, 200, "recovered")
    })
    server.createContext("/dead", handler(respond(_, 503, "down")))
    // stalls past the client read timeout without ever responding
    server.createContext("/slow", handler { ex =>
      Thread.sleep(2000); respond(ex, 200, "too late")
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = {
    try server.stop(0) finally super.afterAll()
  }

  test("retry-then-succeed and skip-after-retry over real sockets") {
    flakyHits.set(0)
    val keys = Seq(
      ("ok", s"$base/ok"), ("flaky", s"$base/flaky"), ("dead", s"$base/dead")
    ).toDF("key", "url").repartition(1) // sequential: flaky's 500 must come first
    val out = Fetch.fetchPartitioned(keys, "key", "url",
      new HttpFetcher(readTimeoutMs = 5000), retries = 1, backoffMs = 10)
      .collect().map(f => f.key -> f).toMap

    assert(out("ok").attempts == 1 && out("ok").error == null &&
      out("ok").body.contains("forecastday"))
    assert(out("flaky").attempts == 2 && out("flaky").error == null &&
      out("flaky").body == "recovered")
    assert(out("dead").attempts == 2 && out("dead").body == null &&
      out("dead").error == "HTTP 503")
    assert(flakyHits.get() == 2)
  }

  test("read-timeout stall lands in the error column, not an exception") {
    val keys = Seq(("slow", s"$base/slow")).toDF("key", "url")
    val out = Fetch.fetchPartitioned(keys, "key", "url",
      new HttpFetcher(readTimeoutMs = 200), retries = 1, backoffMs = 10)
      .collect().head
    assert(out.body == null && out.error.startsWith("timeout") &&
      out.attempts == 2)
  }

  test("fetched bodies flow into the downstream weather parser unchanged") {
    val keys = Seq(("30301", s"$base/ok")).toDF("key", "url")
    val fetched = Fetch.ok(Fetch.fetchPartitioned(keys, "key", "url",
      new HttpFetcher(readTimeoutMs = 5000)))
    val rows = Parsers.weatherRows(fetched.select("key", "body"))
      .as[(String, java.sql.Date, Double)].collect().toSeq
    assert(rows == Seq(("30301", java.sql.Date.valueOf("2026-01-09"), 0.42)))
  }
}
