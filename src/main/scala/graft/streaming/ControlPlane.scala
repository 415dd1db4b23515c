package graft.streaming

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.SparkSession

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/**
 * Minimal REST control plane over the StreamingQueryManager.
 *
 * Reference: crates/rest-api/src/lib.rs:19-52 + pipelines.rs — health/ready,
 * pipeline list/status/stop, DLQ inspection. The Spark analog needs no
 * bespoke runtime: queries ARE the pipelines, `StreamingQueryManager` is the
 * registry, progress comes from each query's `lastProgress`. Pause ≈ stop +
 * restart-from-checkpoint (reference C-8 maps to exactly this).
 *
 * Endpoints:
 *   GET  /health                 → {"status":"ok"}
 *   GET  /pipelines              → [{id,name,isActive}...]
 *   GET  /pipelines/{id}         → status + lastProgress JSON
 *   POST /pipelines/{id}/stop    → stops the query
 *   GET  /dlq?path=...&limit=N   → recent DLQ journal entries
 */
class ControlPlane(spark: SparkSession, port: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  def boundPort: Int = server.getAddress.getPort

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def esc(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"; case c => c.toString }

  private def queryList(): String =
    spark.streams.active.map { q =>
      s"""{"id":"${q.id}","runId":"${q.runId}","name":"${Option(q.name).getOrElse("")}","isActive":${q.isActive}}"""
    }.mkString("[", ",", "]")

  def start(): ControlPlane = {
    server.createContext("/health", (ex: HttpExchange) =>
      respond(ex, 200, """{"status":"ok"}"""))
    server.createContext("/pipelines", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val path = ex.getRequestURI.getPath.stripPrefix("/pipelines").stripPrefix("/")
        (ex.getRequestMethod, path) match {
          case ("GET", "") => respond(ex, 200, queryList())
          case ("GET", id) =>
            spark.streams.active.find(q => q.id.toString == id || q.name == id) match {
              case Some(q) =>
                val prog = Option(q.lastProgress).map(_.json).getOrElse("null")
                respond(ex, 200,
                  s"""{"id":"${q.id}","isActive":${q.isActive},"lastProgress":$prog}""")
              case None => respond(ex, 404, s"""{"error":"no pipeline $id"}""")
            }
          case ("POST", p) if p.endsWith("/stop") =>
            val id = p.stripSuffix("/stop")
            spark.streams.active.find(q => q.id.toString == id || q.name == id) match {
              case Some(q) => q.stop(); respond(ex, 200, """{"stopped":true}""")
              case None => respond(ex, 404, s"""{"error":"no pipeline $id"}""")
            }
          case _ => respond(ex, 405, """{"error":"method not allowed"}""")
        }
      }
    })
    server.createContext("/dlq", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val params = Option(ex.getRequestURI.getQuery).getOrElse("").split("&")
          .filter(_.contains("=")).map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap
        params.get("path") match {
          case None => respond(ex, 400, """{"error":"path param required"}""")
          case Some(p) =>
            val limit = params.getOrElse("limit", "20").toInt
            try {
              val rows = spark.read.parquet(p)
                .orderBy(org.apache.spark.sql.functions.col("timestamp").desc)
                .limit(limit).toJSON.collect()
              respond(ex, 200, rows.mkString("[", ",", "]"))
            } catch {
              case e: Throwable => respond(ex, 500, s"""{"error":"${esc(e.getMessage)}"}""")
            }
        }
      }
    })
    server.start()
    this
  }

  def stop(): Unit = server.stop(0)
}
