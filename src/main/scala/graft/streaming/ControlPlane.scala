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
 *
 * With a [[PipelineManager]] attached, the full CRUD surface of the
 * reference REST API (pipelines.rs:44-120) is served:
 *   POST   /pipelines            → create from YAML/JSON spec body
 *   PATCH  /pipelines/{name}     → deep-merge patch + restart from checkpoint
 *   POST   /pipelines/{name}/pause|resume|stop
 *   DELETE /pipelines/{name}     → stop + remove checkpoints/ledger
 */
class ControlPlane(spark: SparkSession, port: Int = 0,
                   manager: Option[PipelineManager] = None,
                   metrics: Option[Metrics.Registry] = None) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  private val dlqQueues = scala.collection.concurrent.TrieMap[String, Dlq.DlqQueue]()

  /** Attach a pipeline's DLQ queue for the ack/purge/peek endpoints. */
  def registerDlq(pipeline: String, queue: Dlq.DlqQueue): ControlPlane = {
    dlqQueues(pipeline) = queue; this
  }

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
      private def body(ex: HttpExchange): String =
        new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      private def attempt(ex: HttpExchange, code: Int = 200)(f: => String): Unit =
        try respond(ex, code, f)
        catch {
          case e: NoSuchElementException => respond(ex, 404, s"""{"error":"${esc(e.getMessage)}"}""")
          case e: Throwable => respond(ex, 400, s"""{"error":"${esc(String.valueOf(e.getMessage))}"}""")
        }
      def handle(ex: HttpExchange): Unit = {
        val path = ex.getRequestURI.getPath.stripPrefix("/pipelines").stripPrefix("/")
        (ex.getRequestMethod, path, manager) match {
          case ("GET", "", Some(mgr)) =>
            respond(ex, 200, mgr.list().map { case (n, m) => mgr.infoJson(n, m) }
              .mkString("[", ",", "]"))
          case ("GET", "", None) => respond(ex, 200, queryList())
          case ("POST", "", Some(mgr)) => attempt(ex, 201) {
            val m = mgr.create(body(ex)); mgr.infoJson(m.pipeline.metadata.name, m)
          }
          case ("PATCH", name, Some(mgr)) if name.nonEmpty && !name.contains("/") =>
            attempt(ex) { val m = mgr.patch(name, body(ex)); mgr.infoJson(name, m) }
          case ("DELETE", name, Some(mgr)) if name.nonEmpty && !name.contains("/") =>
            attempt(ex) { mgr.delete(name); """{"deleted":true}""" }
          case ("POST", p, Some(mgr)) if p.endsWith("/pause") =>
            attempt(ex) { val n = p.stripSuffix("/pause"); mgr.infoJson(n, mgr.pause(n)) }
          case ("POST", p, Some(mgr)) if p.endsWith("/resume") =>
            attempt(ex) { val n = p.stripSuffix("/resume"); mgr.infoJson(n, mgr.resume(n)) }
          case ("POST", p, Some(mgr)) if p.endsWith("/stop") =>
            attempt(ex) { val n = p.stripSuffix("/stop"); mgr.infoJson(n, mgr.stop(n)) }
          case ("GET", name, Some(mgr)) if mgr.get(name).isDefined =>
            respond(ex, 200, mgr.infoJson(name, mgr.get(name).get))
          case ("GET", id, _) =>
            spark.streams.active.find(q => q.id.toString == id || q.name == id) match {
              case Some(q) =>
                val prog = Option(q.lastProgress).map(_.json).getOrElse("null")
                respond(ex, 200,
                  s"""{"id":"${q.id}","isActive":${q.isActive},"lastProgress":$prog}""")
              case None => respond(ex, 404, s"""{"error":"no pipeline $id"}""")
            }
          case ("POST", p, None) if p.endsWith("/stop") =>
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
        val sub = ex.getRequestURI.getPath.stripPrefix("/dlq").stripPrefix("/")
        // queue surface: /dlq/{pipeline}/entries|count|ack|purge
        // (reference rest-api dlq_peek/dlq_count/dlq_ack/dlq_purge)
        if (sub.nonEmpty) {
          val (name, action) = sub.split("/", 2) match {
            case Array(n, a) => (n, a)
            case Array(n) => (n, "entries")
          }
          dlqQueues.get(name) match {
            case None => respond(ex, 404, s"""{"error":"no dlq for pipeline $name"}""")
            case Some(q) => (ex.getRequestMethod, action) match {
              case ("GET", "entries") =>
                val limit = params.getOrElse("limit", "20").toInt
                respond(ex, 200, q.peek(limit)
                  .map { case (seq, j) => s"""{"seq":$seq,"entry":$j}""" }.mkString("[", ",", "]"))
              case ("GET", "count") => respond(ex, 200,
                s"""{"count":${q.len},"evicted":${q.evictedTotal},"rejected":${q.rejectedTotal}}""")
              case ("POST", "ack") =>
                val upTo = params.getOrElse("upTo", "-1").toLong
                respond(ex, 200, s"""{"acked":${q.ack(upTo)}}""")
              case ("POST", "purge") => respond(ex, 200, s"""{"purged":${q.purge()}}""")
              case _ => respond(ex, 405, """{"error":"method not allowed"}""")
            }
          }
          return
        }
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
    server.createContext("/metrics", (ex: HttpExchange) => {
      val body = metrics.map(_.scrape()).getOrElse("")
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "text/plain; version=0.0.4")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    this
  }

  def stop(): Unit = server.stop(0)
}
