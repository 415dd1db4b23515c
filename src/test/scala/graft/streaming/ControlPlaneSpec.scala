package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

class ControlPlaneSpec extends SparkSpec {

  private def get(port: Int, path: String): (Int, String) = {
    val client = HttpClient.newHttpClient()
    val res = client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (res.statusCode(), res.body())
  }

  private def post(port: Int, path: String): (Int, String) = {
    val client = HttpClient.newHttpClient()
    val res = client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .POST(HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())
    (res.statusCode(), res.body())
  }

  test("health, pipeline list/status/stop over a live streaming query") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val cp = new ControlPlane(spark).start()
    try {
      assert(get(cp.boundPort, "/health") == (200, """{"status":"ok"}"""))

      val ms = MemoryStream[Int]
      val dir = Files.createTempDirectory("cp").toString
      val q = ms.toDF().writeStream.queryName("cp_test_pipeline")
        .option("checkpointLocation", s"$dir/chk")
        .format("memory").trigger(Trigger.ProcessingTime("200 milliseconds")).start()
      ms.addData(1, 2, 3)
      q.processAllAvailable()

      val (c1, list) = get(cp.boundPort, "/pipelines")
      assert(c1 == 200 && list.contains("cp_test_pipeline") && list.contains("\"isActive\":true"))

      val (c2, status) = get(cp.boundPort, s"/pipelines/${q.id}")
      assert(c2 == 200 && status.contains("\"isActive\":true") && status.contains("lastProgress"))

      val (c3, stopped) = post(cp.boundPort, s"/pipelines/${q.id}/stop")
      assert(c3 == 200 && stopped.contains("true"))
      q.awaitTermination(30000)
      assert(!q.isActive)

      assert(get(cp.boundPort, "/pipelines/nonexistent")._1 == 404)
    } finally cp.stop()
  }

  test("dlq endpoint serves recent journal entries") {
    val cp = new ControlPlane(spark).start()
    try {
      val dir = Files.createTempDirectory("cpdlq").toString
      import spark.implicits._
      Seq((1700000000001L, "e1", "boom")).toDF("timestamp", "event_id", "error")
        .write.parquet(s"$dir/dlq")
      val (code, body) = get(cp.boundPort, s"/dlq?path=$dir/dlq&limit=5")
      assert(code == 200 && body.contains("e1") && body.contains("boom"))
      assert(get(cp.boundPort, "/dlq")._1 == 400)
    } finally cp.stop()
  }
}
