package graft.streaming

import graft.SparkSpec

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}

/**
 * Pipeline CRUD end-to-end over the REST control plane (reference
 * rest-api/src/pipelines.rs:44-120 + pipeline_manager.rs:205-930):
 * create from a YAML spec, observe rows flow, PATCH a filter and observe
 * the changed output after restart-from-checkpoint, stop, delete.
 */
class PipelineCrudSpec extends SparkSpec {

  private val http = HttpClient.newHttpClient()

  private def send(method: String, url: String, body: String = ""): (Int, String) = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .method(method, HttpRequest.BodyPublishers.ofString(body)).build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def writeSegment(dir: String, name: String, ids: Range, op: Long => String): Unit = {
    val events = ids.map { i =>
      s"""{"op":"${op(i.toLong)}","after":"{\\"id\\":$i}","ts_ms":${1700000000000L + i},""" +
        s""""event_id":"e$i","source":{"db":"inventory","table":"orders","sequence":$i},"tx_end":true}"""
    }
    Files.write(Paths.get(s"$dir/$name"), events.mkString("\n").getBytes)
  }

  private def await(timeoutMs: Long = 30000)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline) {
      if (cond) return true
      Thread.sleep(200)
    }
    cond
  }

  private def lakeOps(lake: String): Map[String, Long] =
    try {
      import org.apache.spark.sql.functions._
      spark.read.parquet(lake).groupBy("op").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    } catch { // dir absent or no parquet footers yet — still warming up
      case _: org.apache.spark.sql.AnalysisException => Map.empty
    }

  test("REST create → rows flow → PATCH filter → changed output → stop → delete") {
    val root = Files.createTempDirectory("crud").toString
    val backlog = s"$root/backlog"; val lake = s"$root/lake"
    Files.createDirectories(Paths.get(backlog))
    // segment 0: ops c for even ids, u for odd
    writeSegment(backlog, "seg-000.jsonl", 1 to 20, i => if (i % 2 == 0) "c" else "u")

    val mgr = new PipelineManager(spark, s"$root/pipelines")
    val cp = new ControlPlane(spark, 0, Some(mgr)).start()
    val base = s"http://127.0.0.1:${cp.boundPort}"
    try {
      val spec =
        s"""metadata:
           |  name: orders-cdc
           |  tenant: acme
           |  labels: {env: test}
           |spec:
           |  source:
           |    kind: backlog
           |    path: $backlog
           |  processors:
           |    - kind: filter
           |      ops: [c, u]
           |      tables: ["inventory.*"]
           |  sinks:
           |    - kind: parquet
           |      id: lake
           |      path: $lake
           |  commit_policy: required
           |""".stripMargin
      val (code, created) = send("POST", s"$base/pipelines", spec)
      assert(code == 201, created)
      assert(created.contains("\"name\":\"orders-cdc\"") && created.contains("\"status\":\"running\""))

      // rows flow: 10 c + 10 u from segment 0
      assert(await() { val m = lakeOps(lake); m.getOrElse("c", 0L) == 10 && m.getOrElse("u", 0L) == 10 },
        s"initial flow incomplete: ${lakeOps(lake)}")

      // list + get surfaces
      val (_, listing) = send("GET", s"$base/pipelines")
      assert(listing.contains("\"orders-cdc\"") && listing.contains("\"checkpoints\""))
      val (gc, info) = send("GET", s"$base/pipelines/orders-cdc")
      assert(gc == 200 && info.contains("\"isActive\":true"))

      // PATCH: narrow the filter to creates only; restart-from-checkpoint.
      // Reference merge semantics (pipeline_manager.rs:1049-1057) are
      // element-wise by index — a shorter patch array keeps the base tail —
      // so the patch must overwrite BOTH elements to narrow ["c","u"].
      val (pc, patched) = send("PATCH", s"$base/pipelines/orders-cdc",
        """{"spec":{"processors":[{"kind":"filter","ops":["c","c"]}]}}""")
      assert(pc == 200, patched)
      assert(patched.contains("\"ops\":[\"c\",\"c\"]"), patched)

      // new events after the patch: only the c's may land
      writeSegment(backlog, "seg-001.jsonl", 21 to 40, i => if (i % 2 == 0) "c" else "u")
      assert(await() { lakeOps(lake).getOrElse("c", 0L) == 20 },
        s"patched flow incomplete: ${lakeOps(lake)}")
      // updates stay at the pre-patch count — the patched filter drops them
      assert(lakeOps(lake).getOrElse("u", 0L) == 10, lakeOps(lake).toString)

      // pause / resume lifecycle
      val (_, pausedInfo) = send("POST", s"$base/pipelines/orders-cdc/pause")
      assert(pausedInfo.contains("\"status\":\"paused\""))
      val (_, resumed) = send("POST", s"$base/pipelines/orders-cdc/resume")
      assert(resumed.contains("\"status\":\"running\""))

      // stop + delete cleans checkpoints
      val (_, stopped) = send("POST", s"$base/pipelines/orders-cdc/stop")
      assert(stopped.contains("\"status\":\"stopped\""))
      val (dc, _) = send("DELETE", s"$base/pipelines/orders-cdc")
      assert(dc == 200)
      assert(!Files.exists(Paths.get(s"$root/pipelines/orders-cdc")))
      val (nc, _) = send("GET", s"$base/pipelines/orders-cdc")
      assert(nc == 404)
    } finally cp.stop()
  }

  test("spec loader builds flatten and outbox processors") {
    val p = PipelineSpec.load(
      """metadata: {name: p2, tenant: t}
        |spec:
        |  source: {kind: backlog, path: /tmp/x}
        |  processors:
        |    - {kind: flatten, separator: "__", max_depth: 2}
        |    - {kind: outbox, topic_template: "${aggregate_type}.${event_type}", strict: true}
        |  sinks: [{kind: memory, id: m}]
        |""".stripMargin)
    assert(p.spec.processors == Seq(
      PipelineSpec.FlattenCfg("__", 2),
      PipelineSpec.OutboxCfg(Some("${aggregate_type}.${event_type}"), "outbox", strict = true)))
    // transforms apply over a conformed envelope without error
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = graft.core.ChangeEvent.conform(
      Seq(1).toDF("i").select(lit("""{"a":{"b":1}}""").as("after"), lit("c").as("op")))
    val out = PipelineSpec.buildProcessors(p.spec).foldLeft(df)((d, f) => f(d))
    assert(out.select("after").as[String].head() == """{"a__b":1}""")
  }

  test("spec loader: a YAML js processor executes user JavaScript in the chain") {
    val p = PipelineSpec.load(
      """metadata: {name: pjs, tenant: t}
        |spec:
        |  source: {kind: backlog, path: /tmp/x}
        |  processors:
        |    - kind: js
        |      id: enrich
        |      inline: |
        |        function processBatch(events) {
        |          for (const ev of events) {
        |            if (ev.after) { ev.after.via = "js"; ev.route({ topic: "t." + ev.op }); }
        |          }
        |          return events.filter(ev => ev.op !== "d");
        |        }
        |  sinks: [{kind: memory, id: m}]
        |""".stripMargin)
    assert(p.spec.processors.exists {
      case PipelineSpec.JsCfg("enrich", inline, 5000L) => inline.contains("processBatch")
      case _ => false
    })
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = graft.core.ChangeEvent.conform(
      Seq(("c", """{"a":1}"""), ("d", null)).toDF("op", "after")
        .withColumn("event_id", concat(lit("e"), col("op"))))
    val out = PipelineSpec.buildProcessors(p.spec).foldLeft(df)((d, f) => f(d)).collect()
    assert(out.length == 1) // delete dropped by the script
    assert(out.head.getAs[String]("after").contains("\"via\":\"js\""))
    assert(out.head.getAs[org.apache.spark.sql.Row]("routing").getAs[String]("topic") == "t.c")

    // a broken script fails at build time, driver-side (js.rs construction errors)
    val bad = PipelineSpec.load(
      """metadata: {name: pbad, tenant: t}
        |spec:
        |  source: {kind: backlog, path: /tmp/x}
        |  processors: [{kind: js, inline: "function nope() {}"}]
        |  sinks: [{kind: memory, id: m}]
        |""".stripMargin)
    intercept[IllegalArgumentException](PipelineSpec.buildProcessors(bad.spec))
  }

  test("spec loader: env expansion, commit policies, merge semantics") {
    val node = PipelineSpec.parseYaml(
      """metadata: {name: p1, tenant: t}
        |spec:
        |  source: {kind: backlog, path: /tmp/x}
        |  sinks: [{kind: memory, id: m}]
        |  commit_policy: quorum:2
        |""".stripMargin)
    val p = PipelineSpec.fromNode(node)
    assert(p.spec.commitPolicy == CdcPipeline.CommitQuorum(2))

    // ${UPPER} expands from env; ${source.db} routing templates pass through
    val expanded = PipelineSpec.expandEnv(
      "path: ${HOME}/x topic: cdc.${source.db}", k => if (k == "HOME") Some("/home/u") else None)
    assert(expanded == "path: /home/u/x topic: cdc.${source.db}")

    // merge: objects deep-merge, arrays element-wise, scalars replace
    val base = PipelineSpec.parseJson(
      """{"spec":{"sinks":[{"id":"a","required":true},{"id":"b"}],"commit_policy":"all"}}""")
    val merged = PipelineSpec.mergeSpec(base,
      PipelineSpec.parseJson("""{"spec":{"sinks":[{"required":false}],"commit_policy":"required"}}"""))
    assert(merged.at("/spec/sinks/0/required").asBoolean() == false)
    assert(merged.at("/spec/sinks/0/id").asText() == "a") // untouched key survives
    assert(merged.at("/spec/sinks/1/id").asText() == "b") // untouched element survives
    assert(merged.at("/spec/commit_policy").asText() == "required")
  }
}
