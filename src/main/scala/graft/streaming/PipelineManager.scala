package graft.streaming

import com.fasterxml.jackson.databind.JsonNode
import graft.core.ChangeEvent
import graft.sources.BacklogSource
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import scala.collection.concurrent.TrieMap
import scala.concurrent.duration._

/**
 * Pipeline lifecycle manager: spec → running streaming query, with
 * create / patch(+restart) / pause / resume / stop / delete.
 *
 * Reference: crates/runner/src/pipeline_manager.rs:205-930 — `create`
 * spawns the pipeline from a `PipelineSpec`; `patch` deep-merges the JSON
 * spec and restarts FROM THE SAME CHECKPOINT (pipeline_manager.rs:741-784),
 * so no events are lost or duplicated across a config change; pause is
 * stop-while-keeping-state; delete removes checkpoints and ledgers.
 *
 * Spark mapping: a pipeline IS a Structured Streaming query; the offset log
 * under `baseDir/<name>/checkpoint` is the resume point; the per-sink
 * [[SinkLedger]] under `baseDir/<name>/ledger` preserves idempotent replay
 * across restarts.
 */
class PipelineManager(spark: SparkSession, baseDir: String) {

  case class Managed(node: JsonNode, pipeline: PipelineSpec.Pipeline,
                     query: Option[StreamingQuery], status: String,
                     startedAtMs: Long)

  private val pipelines = TrieMap[String, Managed]()

  private def checkpointDir(name: String) = s"$baseDir/$name/checkpoint"
  private def ledgerDir(name: String) = s"$baseDir/$name/ledger"

  private def launch(p: PipelineSpec.Pipeline): StreamingQuery = {
    val stream = spark.readStream.format(classOf[BacklogSource].getName)
      .option("path", p.spec.source.path)
      .options(p.spec.source.maxLinesPerTrigger.map(n => Map("maxLinesPerTrigger" -> n.toString)).getOrElse(Map.empty))
      .load()
      // full envelope schema (incl. the map<string,string> routing headers)
      // qualifies for the fused byte-level decoder since r15 — from_json-
      // identical by spec, one pass, no Jackson
      .select(graft.functions.JsonDecode.fusedFromJson(col("value"), ChangeEvent.schema).as("e"))
      .select("e.*")
    val cfg = CdcPipeline.Config(
      sinks = PipelineSpec.buildSinks(p.spec),
      commitPolicy = p.spec.commitPolicy,
      ledgerDir = ledgerDir(p.metadata.name),
      sinkTimeout = p.spec.sinkDeadlineSecs.map(_.seconds: Duration).getOrElse(5.minutes),
      processors = PipelineSpec.buildProcessors(p.spec))
    CdcPipeline.start(cfg, stream, checkpointDir(p.metadata.name),
      Trigger.ProcessingTime("500 milliseconds"))
  }

  def create(specText: String): Managed = {
    val node = PipelineSpec.parseAny(specText)
    val p = PipelineSpec.fromNode(node)
    require(!pipelines.contains(p.metadata.name), s"pipeline '${p.metadata.name}' already exists")
    val m = Managed(node, p, Some(launch(p)), "running", System.currentTimeMillis())
    pipelines(p.metadata.name) = m
    m
  }

  /** Deep-merge `patchText` into the stored spec, stop, and restart from
   * the same checkpoint (pipeline_manager.rs:741-784). */
  def patch(name: String, patchText: String): Managed = {
    val m = get(name).getOrElse(throw new NoSuchElementException(s"no pipeline $name"))
    val merged = PipelineSpec.mergeSpec(m.node, PipelineSpec.parseAny(patchText))
    val p = PipelineSpec.fromNode(merged)
    require(p.metadata.name == name, "patch must not rename the pipeline")
    m.query.foreach(q => { q.stop(); q.awaitTermination() })
    val next = Managed(merged, p, Some(launch(p)), "running", System.currentTimeMillis())
    pipelines(name) = next
    next
  }

  def pause(name: String): Managed = transition(name, "paused") { m =>
    m.query.foreach(q => { q.stop(); q.awaitTermination() }); None
  }

  def resume(name: String): Managed = transition(name, "running") { m =>
    require(m.query.forall(!_.isActive), s"pipeline $name already active")
    Some(launch(m.pipeline))
  }

  def stop(name: String): Managed = transition(name, "stopped") { m =>
    m.query.foreach(q => { q.stop(); q.awaitTermination() }); None
  }

  private def transition(name: String, status: String)(f: Managed => Option[StreamingQuery]): Managed = {
    val m = get(name).getOrElse(throw new NoSuchElementException(s"no pipeline $name"))
    val next = m.copy(query = f(m), status = status,
      startedAtMs = if (status == "running") System.currentTimeMillis() else m.startedAtMs)
    pipelines(name) = next
    next
  }

  /** Stop and remove checkpoints + ledger (pipeline_manager.rs:888-925). */
  def delete(name: String): Unit = {
    get(name).foreach { m => m.query.foreach(q => { q.stop(); q.awaitTermination() }) }
    pipelines.remove(name)
    val dir = java.nio.file.Paths.get(s"$baseDir/$name")
    if (java.nio.file.Files.exists(dir)) {
      java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  def get(name: String): Option[Managed] = pipelines.get(name)
  def list(): Seq[(String, Managed)] = pipelines.toSeq.sortBy(_._1)

  /** Operator-facing status JSON (PipeInfo + ops shape, rest-api
   * pipelines.rs:20-43). */
  def infoJson(name: String, m: Managed): String = {
    val uptime = if (m.status == "running") (System.currentTimeMillis() - m.startedAtMs) / 1000.0 else 0.0
    val ledger = new SinkLedger(ledgerDir(name))
    val checkpoints = m.pipeline.spec.sinks
      .map(s => s""""${s.id}":${ledger.committed(s.id)}""").mkString("{", ",", "}")
    val active = m.query.exists(_.isActive)
    s"""{"name":"$name","status":"${m.status}","isActive":$active,""" +
      s""""ops":{"uptime_seconds":$uptime,"checkpoints":$checkpoints},""" +
      s""""spec":${PipelineSpec.toJsonString(m.node)}}"""
  }
}
