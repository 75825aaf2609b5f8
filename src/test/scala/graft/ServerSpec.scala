package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import com.fasterxml.jackson.databind.ObjectMapper

import graft.engine.SparkEngine
import graft.server.HttpFront

/** HTTP front wire contract: envelope fields, in-band error surface,
  * health probe — the reference's remote-client behaviors
  * (quack.py:49-83) over the JDK server.
  */
class ServerSpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private lazy val client = HttpClient.newHttpClient()

  private def withServer[T](body: Int => T): T = {
    val server = HttpFront.start(SparkEngine.wrap(spark), spark, SfDir, port = 0)
    try body(server.getAddress.getPort)
    finally HttpFront.stop(server)
  }

  private def post(port: Int, json: String): (Int, String) = {
    val req = HttpRequest.newBuilder(URI.create(s"http://localhost:$port/query"))
      .POST(HttpRequest.BodyPublishers.ofString(json)).build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("query returns the metadata envelope, columns, and records") {
    withServer { port =>
      val (status, body) = post(port,
        """{"q": "SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1 ORDER BY 1", "limit": 3}""")
      assert(status == 200)
      val node = mapper.readTree(body)
      assert(node.get("columns").get(0).asText == "event_type")
      assert(node.get("columns").get(1).asText == "n")
      assert(node.get("records").size == 3)
      assert(node.get("records").get(0).has("n"))
      val meta = node.get("metadata")
      Seq("timeMs", "epochMs", "eventId", "query", "warm")
        .foreach(f => assert(meta.has(f), s"metadata missing $f"))
    }
  }

  test("engine errors surface in-band as errorMessage with HTTP 200") {
    withServer { port =>
      val (status, body) = post(port, """{"q": "SELEKT broken"}""")
      assert(status == 200)
      val node = mapper.readTree(body)
      assert(node.get("errorMessage").asText.contains("PARSE_SYNTAX_ERROR"))
    }
  }

  test("transport errors are HTTP-level: bad JSON 400, GET 405, oversize 413") {
    withServer { port =>
      assert(post(port, "this is not json")._1 == 400)
      val get = HttpRequest.newBuilder(
        URI.create(s"http://localhost:$port/query")).GET().build()
      assert(client.send(get, HttpResponse.BodyHandlers.ofString()).statusCode() == 405)
      // a body over the 1 MiB cap is rejected before any parse/execute
      val huge = """{"q": """" + ("x" * (HttpFront.MaxBodyBytes + 16)) + """"}"""
      assert(post(port, huge)._1 == 413)
    }
  }

  test("empty query returns an empty result with metadata, not an error") {
    withServer { port =>
      val (status, body) = post(port, """{"q": ""}""")
      assert(status == 200)
      val node = mapper.readTree(body)
      assert(node.get("records").size == 0)
      assert(node.get("metadata").has("eventId"))
    }
  }

  test("loopback-only bind by default: the server address is 127.0.0.1") {
    val server = HttpFront.start(SparkEngine.wrap(spark), spark, SfDir, port = 0)
    try assert(server.getAddress.getAddress.isLoopbackAddress)
    finally HttpFront.stop(server)
  }

  test("concurrent requests through the pool return consistent envelopes") {
    // validates the "small fixed pool is enough" claim: simultaneous
    // POSTs (more than the 4 pool threads) each get a complete,
    // independent envelope — no cross-talk, no dropped responses
    withServer { port =>
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val results = Await.result(
        Future.sequence((1 to 8).map(i => Future(
          (i, post(port,
            s"""{"q": "SELECT $i AS tag, COUNT(*) AS n FROM events", "limit": 5}"""))))),
        2.minutes)
      results.foreach { case (i, (status, body)) =>
        assert(status == 200, s"request $i got $status")
        val node = mapper.readTree(body)
        assert(node.get("records").get(0).get("tag").asInt == i,
          s"request $i got someone else's result: $body")
        assert(node.get("records").get(0).get("n").asLong > 0)
        assert(node.get("metadata").has("eventId"))
      }
      assert(results.map(_._2._2).map(mapper.readTree(_)
        .get("metadata").get("eventId").asText).distinct.size == 8)
    }
  }

  test("concurrent cold-start queries through the pool agree on a fresh corpus") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    import graft.sources.Lake
    // A COPIED corpus gets fresh mtimes, hence a fresh fingerprint,
    // hence a guaranteed-unbuilt micros events copy: the simultaneous
    // requests all contend on the first-touch build through the real
    // HTTP pool (the production cold-start scenario; Lake.ensureBuilt
    // serializes the build — LakeSpec asserts build-once directly).
    val dir = java.nio.file.Files.createTempDirectory("graft-cold").toString
    Lake.tableNames.foreach { t =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$SfDir/$t.parquet"),
        java.nio.file.Paths.get(s"$dir/$t.parquet"))
    }
    val server = HttpFront.start(SparkEngine.wrap(spark), spark, dir, port = 0)
    try {
      val port = server.getAddress.getPort
      val results = Await.result(
        Future.sequence((1 to 6).map(_ => Future(
          post(port, """{"q": "SELECT COUNT(*) AS n FROM events"}""")))),
        2.minutes)
      val expected = Lake.rowCount(spark, dir, "events")
      results.foreach { case (status, body) =>
        assert(status == 200, s"cold-start request got $status: $body")
        val node = mapper.readTree(body)
        assert(!node.has("errorMessage"), s"cold-start error: $body")
        assert(node.get("records").get(0).get("n").asLong == expected,
          s"cold-start result mismatch: $body")
      }
    } finally HttpFront.stop(server)
  }

  test("health probe reports ok and the warm flag flips after first use") {
    withServer { port =>
      def health() = {
        val req = HttpRequest.newBuilder(
          URI.create(s"http://localhost:$port/health")).GET().build()
        mapper.readTree(client.send(req, HttpResponse.BodyHandlers.ofString()).body())
      }
      assert(health().get("ok").asBoolean)
      assert(!health().get("warm").asBoolean) // engine untouched: cold
      post(port, """{"q": "SELECT 1 AS one"}""")
      assert(health().get("warm").asBoolean)  // first execute warmed it
    }
  }

  test("worker pool threads are daemon and stop() terminates them (rc-124 regression)") {
    // HttpServer.stop() does not shut down a caller-supplied executor;
    // with non-daemon workers the embedding JVM (bench, a forked test
    // run) then never exits — the harness kills it at timeout (rc 124).
    // Contract: workers are daemon (JVM exit is unconditional) AND
    // HttpFront.stop shuts the pool down (threads die promptly).
    import scala.jdk.CollectionConverters._
    val server = HttpFront.start(SparkEngine.wrap(spark), spark, SfDir, port = 0)
    val port = server.getAddress.getPort
    post(port, """{"q": "SELECT 1 AS one"}""") // spin a worker up
    def workers() = Thread.getAllStackTraces.keySet.asScala
      .filter(_.getName == "graft-http").toSeq
    val live = workers()
    assert(live.nonEmpty, "a worker thread should exist after a request")
    assert(live.forall(_.isDaemon), "worker threads must be daemon")
    HttpFront.stop(server)
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (workers().exists(_.isAlive) && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(workers().forall(!_.isAlive),
      "stop() must terminate the worker pool")
  }
}
