package graft.streaming

import graft.SparkSpec
import graft.core.ChangeEvent
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

/** RecordBatch v2 + Produce v3 codec and the socket producer e2e. */
class KafkaWireSpec extends SparkSpec {
  import KafkaWire._

  private def events(n: Int): DataFrame = {
    import spark.implicits._
    ChangeEvent.conform(
      (1 to n).map(i => ("c", s"""{"id":$i}""", i.toLong)).toDF("op", "after", "ts_ms")
        .withColumn("source", struct(lit("db").as("db"), lit("t").as("table"),
          col("ts_ms").as("sequence")))
        .withColumn("event_id", concat(lit("e"), col("ts_ms")))
        .withColumn("tx_end", lit(true)))
  }

  test("record batch v2: round-trip with null keys, headers, timestamp deltas, idempotence triple") {
    val recs = Seq(
      Record("k1".getBytes(UTF_8), "v1".getBytes(UTF_8),
        Seq("h" -> "x".getBytes(UTF_8)), timestampMs = 1000L),
      Record(null, "v2".getBytes(UTF_8), Nil, timestampMs = 1500L),
      Record("k3".getBytes(UTF_8), null, Seq("a" -> null), timestampMs = 999L))
    val bytes = encodeBatch(recs, baseOffset = 42L,
      producerId = 7L, producerEpoch = 3, baseSequence = 100)
    val (baseOffset, pid, epoch, baseSeq, got) = decodeBatch(bytes)
    assert(baseOffset == 42L && pid == 7L && epoch == 3 && baseSeq == 100)
    assert(got.length == 3)
    assert(new String(got(0).key, UTF_8) == "k1" && new String(got(0).value, UTF_8) == "v1")
    assert(got(0).headers.map { case (k, v) => k -> new String(v, UTF_8) } == Seq("h" -> "x"))
    assert(got(1).key == null && got(2).value == null && got(2).headers.head._2 == null)
    assert(got.map(_.timestampMs) == Seq(1000L, 1500L, 999L)) // deltas vs min base
  }

  test("record batch v2: corruption fails the CRC32C check") {
    val bytes = encodeBatch(Seq(Record("k".getBytes(UTF_8), "v".getBytes(UTF_8))))
    bytes(bytes.length - 1) = (bytes.last ^ 0x01).toByte
    intercept[IllegalArgumentException] { decodeBatch(bytes) }
  }

  test("produce v3: request and response round-trip") {
    val batch = encodeBatch(Seq(Record(null, "x".getBytes(UTF_8))))
    val reqBytes = encodeProduceRequest(9, "graft-test", "txn-1", acks = -1,
      timeoutMs = 1000, topic = "cdc.t", partitionBatches = Seq(0 -> batch))
    val req = readProduceRequest(new DataInputStream(
      new java.io.ByteArrayInputStream(reqBytes)))
    assert(req.correlationId == 9 && req.clientId == "graft-test" &&
      req.transactionalId == "txn-1" && req.acks == -1 && req.topic == "cdc.t")
    assert(java.util.Arrays.equals(req.batches.head._2, batch))
    val respBytes = encodeProduceResponse(ProduceResponse(9, "cdc.t",
      Seq(PartitionAck(0, 0, 1234L))))
    val resp = readProduceResponse(new DataInputStream(
      new java.io.ByteArrayInputStream(respBytes)))
    assert(resp.correlationId == 9 && resp.acks.head.baseOffset == 1234L)
  }

  /** Minimal broker: decodes Produce v3, CRC-checks batches, appends, acks. */
  private class BrokerStub(failFirst: Boolean = false) {
    case class Appended(topic: String, pid: Long, baseSeq: Int, key: String, value: String)
    val log = new ConcurrentLinkedQueue[Appended]()
    val requests = new AtomicInteger(0)
    private val server = new ServerSocket(0)
    val port: Int = server.getLocalPort
    @volatile private var running = true
    private val acceptor = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          new Thread(() => {
            try {
              val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
              val out = new BufferedOutputStream(sock.getOutputStream)
              while (true) {
                val req = readProduceRequest(in)
                val n = requests.incrementAndGet()
                if (failFirst && n == 1) {
                  out.write(encodeProduceResponse(ProduceResponse(req.correlationId,
                    req.topic, Seq(PartitionAck(0, 7, -1L))))) // REQUEST_TIMED_OUT
                } else {
                  req.batches.foreach { case (_, b) =>
                    val (_, pid, _, baseSeq, recs) = decodeBatch(b) // CRC-verifies
                    recs.foreach { r =>
                      log.add(Appended(req.topic, pid, baseSeq,
                        if (r.key == null) null else new String(r.key, UTF_8),
                        new String(r.value, UTF_8)))
                    }
                  }
                  out.write(encodeProduceResponse(ProduceResponse(req.correlationId,
                    req.topic, Seq(PartitionAck(0, 0, log.size().toLong)))))
                }
                out.flush()
              }
            } catch { case _: java.io.IOException => () }
            finally sock.close()
          }).start()
        } catch { case _: java.io.IOException => () }
      }
    })
    acceptor.start()
    def stop(): Unit = { running = false; server.close() }
  }

  test("kafka sink e2e over the wire: batches land CRC-verified with idempotence fields") {
    val stub = new BrokerStub()
    try {
      val port = stub.port
      val sink = new MessagingSinks.KafkaLikeSink("kw",
        () => new SocketProducer("127.0.0.1", port, "graft-kw", "graft-pipe-kw"),
        topicTemplate = Some("cdc.${source.table}"))
      sink.write(events(40), 0L)
      val appended = stub.log.toArray(Array.empty[AnyRef]).map(_.asInstanceOf[stub.Appended])
      assert(appended.length == 40)
      assert(appended.forall(_.topic == "cdc.t"))
      assert(appended.forall(_.pid == 1L)) // idempotence triple on the wire
      assert(appended.map(_.key).distinct.length == 40) // event-id keys
      assert(appended.head.value.contains("\"op\":\"c\""))
    } finally stub.stop()
  }

  test("truncated varint raises EOF instead of spinning") {
    intercept[java.io.EOFException] {
      readVarLong(new java.io.ByteArrayInputStream(Array[Byte](0x80.toByte)))
    }
    intercept[java.io.EOFException] {
      readVarLong(new java.io.ByteArrayInputStream(Array.empty[Byte]))
    }
  }

  test("sequences are per topic and advance only on ack — replay re-sends the same triple") {
    // failing stub: the FIRST produce request errors; pending must survive
    val stub = new BrokerStub(failFirst = true)
    try {
      val p = new SocketProducer("127.0.0.1", stub.port, "c-seq")
      p.beginTransaction()
      p.send(MessagingSinks.WireRecord("topic-a", "k1", "v1".getBytes(UTF_8), Map.empty))
      p.send(MessagingSinks.WireRecord("topic-b", "k2", "v2".getBytes(UTF_8), Map.empty))
      intercept[RuntimeException] { p.commitTransaction() } // topic-a errors first
      assert(stub.log.isEmpty) // nothing appended by the failed round
      p.commitTransaction() // replay: stub healthy from request 2 on
      val appended = stub.log.toArray(Array.empty[AnyRef]).map(_.asInstanceOf[stub.Appended])
      assert(appended.map(_.key).toSet == Set("k1", "k2")) // both delivered
      // per-topic sequencing, NOT a shared counter; and the failed attempt
      // did not advance it — both topics start at 0 (broker-dedup-able)
      assert(appended.forall(_.baseSeq == 0))
    } finally stub.stop()
  }

  test("abort leaves nothing on the wire; broker error fails the batch write") {
    val stub = new BrokerStub()
    try {
      val p = new SocketProducer("127.0.0.1", stub.port, "c1")
      p.beginTransaction()
      p.send(MessagingSinks.WireRecord("t", "k", "v".getBytes(UTF_8), Map.empty))
      p.abortTransaction()
      assert(stub.log.isEmpty && stub.requests.get() == 0) // abort = zero wire traffic

      p.beginTransaction()
      p.send(MessagingSinks.WireRecord("t", "k", "v".getBytes(UTF_8), Map.empty))
      p.commitTransaction()
      assert(stub.log.size() == 1)
    } finally stub.stop()

    val failing = new BrokerStub(failFirst = true)
    try {
      val p2 = new SocketProducer("127.0.0.1", failing.port, "c2")
      p2.beginTransaction()
      p2.send(MessagingSinks.WireRecord("t", "k", "v".getBytes(UTF_8), Map.empty))
      intercept[RuntimeException] { p2.commitTransaction() } // error code 7 surfaces
      assert(failing.log.isEmpty) // nothing appended by the failed request
    } finally failing.stop()
  }
}
