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
 *
 * Schema & sensing inspection (reference rest-api/src/schemas.rs:123-140,
 * sensing.rs:186-207), served from a registered [[SchemaRegistry]] /
 * [[SchemaSensor]]:
 *   GET /pipelines/{p}/schemas                       → per-table latest versions
 *   GET /pipelines/{p}/schemas/{table}               → columns + fingerprint
 *   GET /pipelines/{p}/schemas/{table}/versions      → full version history
 *   GET /pipelines/{p}/schemas/{table}/at/{seq}      → schema AT a sequence
 *   GET /pipelines/{p}/sensing/schemas[/{table}[/json-schema]]
 *   GET /pipelines/{p}/sensing/stats                 → structure-cache stats
 *   GET /pipelines/{p}/drift[/{table}]               → latest drift results
 */
class ControlPlane(spark: SparkSession, port: Int = 0,
                   manager: Option[PipelineManager] = None,
                   metrics: Option[Metrics.Registry] = None) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  private val dlqQueues = scala.collection.concurrent.TrieMap[String, Dlq.DlqQueue]()
  private val registries = scala.collection.concurrent.TrieMap[String, SchemaRegistry]()
  private val sensors = scala.collection.concurrent.TrieMap[String, SchemaSensor]()

  /** Attach a pipeline's DLQ queue for the ack/purge/peek endpoints. */
  def registerDlq(pipeline: String, queue: Dlq.DlqQueue): ControlPlane = {
    dlqQueues(pipeline) = queue; this
  }

  /** Attach a pipeline's declared-schema ledger for the /schemas endpoints. */
  def registerSchemaRegistry(pipeline: String, registry: SchemaRegistry): ControlPlane = {
    registries(pipeline) = registry; this
  }

  /** Attach a pipeline's sensor for the /sensing and /drift endpoints. */
  def registerSensor(pipeline: String, sensor: SchemaSensor): ControlPlane = {
    sensors(pipeline) = sensor; this
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
    s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      // every other control char must also be escaped or the JSON is invalid
      case c if c < 0x20 => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** /pipelines/{p}/schemas|sensing|drift/... (reference schemas.rs + sensing.rs routes). */
  private def handleInspection(ex: HttpExchange, pipeline: String, rest: Seq[String]): Unit = {
    if (ex.getRequestMethod != "GET") { respond(ex, 405, """{"error":"method not allowed"}"""); return }
    def columnsJson(s: org.apache.spark.sql.types.StructType): String =
      s.fields.zipWithIndex.map { case (f, i) =>
        s"""{"name":"${esc(f.name)}","data_type":"${esc(f.dataType.sql.toLowerCase)}",""" +
          s""""nullable":${f.nullable},"ordinal_position":${i + 1}}"""
      }.mkString("[", ",", "]")
    try rest match {
      // ——— declared-schema ledger ———
      case Seq("schemas", tail @ _*) => registries.get(pipeline) match {
        case None => respond(ex, 404, s"""{"error":"no schema registry for pipeline $pipeline"}""")
        case Some(reg) =>
          // ledger rows are tiny (one per registered version); collect once per request
          val rows = reg.ledger().collect()
            .map(r => (r.getAs[String]("table"), r.getAs[String]("fingerprint"),
              r.getAs[Long]("sequence"), r.getAs[Long]("registered_at_ms"),
              r.getAs[String]("schema_json")))
          def structOf(json: String) = org.apache.spark.sql.types.DataType.fromJson(json)
            .asInstanceOf[org.apache.spark.sql.types.StructType]
          tail match {
            case Seq() => // SchemaInfo list: latest version per table
              val latest = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, vs) =>
                val v = vs.maxBy(_._3)
                s"""{"table":"${esc(t)}","fingerprint":"${v._2}","sequence":${v._3},""" +
                  s""""column_count":${structOf(v._5).fields.length},"registered_at_ms":${v._4}}"""
              }
              respond(ex, 200, latest.mkString("[", ",", "]"))
            case Seq(table) =>
              rows.filter(_._1 == table).sortBy(_._3).lastOption match {
                case None => respond(ex, 404, s"""{"error":"no schema for table $table"}""")
                case Some(v) => respond(ex, 200,
                  s"""{"table":"${esc(table)}","fingerprint":"${v._2}","sequence":${v._3},""" +
                    s""""registered_at_ms":${v._4},"columns":${columnsJson(structOf(v._5))}}""")
              }
            case Seq(table, "versions") =>
              val vs = rows.filter(_._1 == table).sortBy(_._3).map { v =>
                s"""{"version":${v._3},"fingerprint":"${v._2}",""" +
                  s""""column_count":${structOf(v._5).fields.length},"registered_at_ms":${v._4}}"""
              }
              respond(ex, 200, vs.mkString("[", ",", "]"))
            // the replay-correctness lookup: schema in force AT a sequence
            case Seq(table, "at", seq) =>
              seq.toLongOption match {
                case None => respond(ex, 400,
                  s"""{"error":"sequence must be an integer, got '${esc(seq)}'"}""")
                case Some(seqL) =>
                  rows.filter(v => v._1 == table && v._3 <= seqL).sortBy(_._3).lastOption match {
                    case None => respond(ex, 404,
                      s"""{"error":"no schema for table $table at sequence $seq"}""")
                    case Some(v) => respond(ex, 200,
                      s"""{"table":"${esc(table)}","fingerprint":"${v._2}","sequence":${v._3},""" +
                        s""""columns":${columnsJson(structOf(v._5))}}""")
                  }
              }
            case _ => respond(ex, 404, """{"error":"not found"}""")
          }
      }
      // ——— inferred schemas + cache stats ———
      case Seq("sensing", tail @ _*) => sensors.get(pipeline) match {
        case None => respond(ex, 404, s"""{"error":"no sensor for pipeline $pipeline"}""")
        case Some(sensor) => tail match {
          case Seq("schemas") =>
            respond(ex, 200, sensor.tableNames.sorted
              .flatMap(sensor.infoJson).mkString("[", ",", "]"))
          case Seq("schemas", table) => sensor.detailJson(table) match {
            case Some(j) => respond(ex, 200, j)
            case None => respond(ex, 404, s"""{"error":"table $table not sensed"}""")
          }
          case Seq("schemas", table, "json-schema") => sensor.jsonSchema(table) match {
            case Some(j) => respond(ex, 200, j)
            case None => respond(ex, 404, s"""{"error":"table $table not sensed"}""")
          }
          case Seq("stats") => respond(ex, 200, sensor.cacheStatsJson)
          // raw classifier evidence (reference sensing.rs evidence dump):
          // HLL cardinality + SpaceSaving heavy hitters + reservoir sample
          case Seq("evidence", evTail @ _*) =>
            def evidenceJson(table: String): Option[String] =
              sensor.evidence(table).map { case (nUnique, heavy, sampled) =>
                val hh = heavy.map { case (f, n) =>
                  s"""{"field":"${esc(f)}","count":$n}"""
                }.mkString("[", ",", "]")
                val sf = sampled.map(f => s""""${esc(f)}"""").mkString("[", ",", "]")
                s"""{"table":"${esc(table)}","n_unique_fields":$nUnique,""" +
                  s""""heavy_hitters":$hh,"sampled_fields":$sf}"""
              }
            evTail match {
              case Seq() => respond(ex, 200,
                sensor.evidenceTables.sorted.flatMap(evidenceJson).mkString("[", ",", "]"))
              case Seq(table) => evidenceJson(table) match {
                case Some(j) => respond(ex, 200, j)
                case None => respond(ex, 404, s"""{"error":"no evidence for table $table"}""")
              }
              case _ => respond(ex, 404, """{"error":"not found"}""")
            }
          case _ => respond(ex, 404, """{"error":"not found"}""")
        }
      }
      // ——— drift results (pushed by the pipeline's drift stage) ———
      case Seq("drift", tail @ _*) => sensors.get(pipeline) match {
        case None => respond(ex, 404, s"""{"error":"no sensor for pipeline $pipeline"}""")
        case Some(sensor) =>
          def driftJson(table: String): Option[String] = sensor.drift(table).map { rows =>
            val cols = rows.map { case (c, k, e, o, n) =>
              s"""{"column":"${esc(c)}","kind":"${esc(k)}","expected":"${esc(e)}",""" +
                s""""observed":"${esc(o)}","n":$n}"""
            }.mkString("[", ",", "]")
            s"""{"table":"${esc(table)}","has_drift":${rows.nonEmpty},"columns":$cols}"""
          }
          tail match {
            case Seq() => respond(ex, 200,
              sensor.driftTables.sorted.flatMap(driftJson).mkString("[", ",", "]"))
            case Seq(table) => driftJson(table) match {
              case Some(j) => respond(ex, 200, j)
              case None => respond(ex, 404, s"""{"error":"no drift results for table $table"}""")
            }
            case _ => respond(ex, 404, """{"error":"not found"}""")
          }
      }
      case _ => respond(ex, 404, """{"error":"not found"}""")
    } catch {
      case e: Throwable => respond(ex, 500, s"""{"error":"${esc(String.valueOf(e.getMessage))}"}""")
    }
  }

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
        val segs = path.split("/").toSeq.filter(_.nonEmpty)
        if (segs.length >= 2 && Set("schemas", "sensing", "drift")(segs(1))) {
          handleInspection(ex, segs.head, segs.drop(1)); return
        }
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
