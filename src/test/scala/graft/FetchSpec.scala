package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.etl.{Fetch, Ingest, IngestOptions}

import java.net.InetSocketAddress
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

/** The real network path of the reference pipeline — download with retry,
  * then ingest — exercised against a local JDK HttpServer (the zero-egress
  * environment's stand-in for a remote file host).
  */
class FetchSpec extends SparkSuite {

  private val csvBody = "id,name\n1,alice\n2,bob\n3,carol\n"

  private def withServer[T](handler: HttpExchange => Unit)(f: Int => T): T = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => handler(ex))
    server.start()
    try f(server.getAddress.getPort)
    finally server.stop(0)
  }

  private def serveCsv(ex: HttpExchange): Unit = {
    val bytes = csvBody.getBytes("UTF-8")
    ex.sendResponseHeaders(200, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  test("download succeeds against a healthy server") {
    withServer(serveCsv) { port =>
      val dest = Files.createTempDirectory("fetch-ok")
      val path = Fetch.downloadWithRetry(s"http://127.0.0.1:$port/people.csv", dest)
      assert(new String(Files.readAllBytes(path), "UTF-8") == csvBody)
      assert(path.getFileName.toString == "people.csv")
    }
  }

  test("retry recovers from transient 5xx (reference retry semantics)") {
    val attempts = new AtomicInteger(0)
    withServer { ex =>
      if (attempts.incrementAndGet() <= 2) {
        ex.sendResponseHeaders(500, -1); ex.close()
      } else serveCsv(ex)
    } { port =>
      val dest = Files.createTempDirectory("fetch-retry")
      val path = Fetch.downloadWithRetry(s"http://127.0.0.1:$port/d.csv", dest,
        retries = 3, delayMs = 10)
      assert(attempts.get() == 3)
      assert(new String(Files.readAllBytes(path), "UTF-8") == csvBody)
    }
  }

  test("retries exhaust into a failure, not a hang") {
    withServer { ex => ex.sendResponseHeaders(503, -1); ex.close() } { port =>
      val dest = Files.createTempDirectory("fetch-fail")
      assertThrows[java.io.IOException](
        Fetch.downloadWithRetry(s"http://127.0.0.1:$port/x.csv", dest,
          retries = 2, delayMs = 10))
    }
  }

  test("full pipeline over http: download -> stage -> infer -> warehouse table") {
    withServer(serveCsv) { port =>
      val results = Ingest.run(spark,
        Seq(s"http://127.0.0.1:$port/web_people.csv"), "httpsrc",
        _ => IngestOptions())
      assert(results.forall(_.isSuccess))
      val df = spark.table("httpsrc.web_people")
      assert(df.count() == 3)
      assert(df.schema("id").dataType.typeName == "integer")
      spark.sql("DROP DATABASE httpsrc CASCADE")
    }
  }
}
