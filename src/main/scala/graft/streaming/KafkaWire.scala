package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, InputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.CRC32C

/**
 * Kafka wire format: RecordBatch v2 (magic 2) codec + Produce v3 framing,
 * and a socket producer that plugs into [[MessagingSinks.KafkaLikeSink]].
 *
 * Reference: crates/sinks/src/kafka.rs drives librdkafka with idempotent
 * production and per-batch transactions (:120-200, txn protocol :191-355).
 * The protocol itself is public (kafka.apache.org/protocol and KIP-98's
 * batch layout); this implements the parts a producer puts ON THE WIRE:
 *
 *  - RecordBatch v2: baseOffset, batchLength, partitionLeaderEpoch,
 *    magic=2, CRC32C (castagnoli, over everything after the crc field),
 *    attributes, lastOffsetDelta, base/max timestamps, producerId/epoch/
 *    baseSequence (the idempotence fields), zigzag-varint records with
 *    headers — byte-compatible with what brokers append to the log.
 *  - Produce v3 request/response: the non-flexible encoding (magic-2
 *    batches entered at v3), nullable strings, array framing,
 *    transactional_id, acks, per-partition error codes.
 *
 * What stays environment-bound (documented, not faked): broker discovery
 * (Metadata), group coordination, and the transaction RPCs
 * (InitProducerId/AddPartitionsToTxn/EndTxn) that need a live cluster's
 * coordinator — the [[MessagingSinks.TransactionalProducer]] contract
 * carries those semantics; [[SocketProducer]] gives batch-atomic,
 * idempotently-sequenced delivery against any endpoint that speaks
 * Produce (spec: a live local TCP stub that CRC-checks and decodes).
 */
object KafkaWire {

  case class Record(key: Array[Byte], value: Array[Byte],
                    headers: Seq[(String, Array[Byte])] = Nil, timestampMs: Long = 0L)

  // —————————————————— zigzag varints (protobuf/kafka encoding) ——————————————————

  def writeVarLong(out: ByteArrayOutputStream, v: Long): Unit = {
    var z = (v << 1) ^ (v >> 63) // zigzag
    while ((z & ~0x7fL) != 0L) { out.write(((z & 0x7f) | 0x80).toInt); z >>>= 7 }
    out.write(z.toInt)
  }
  def writeVarInt(out: ByteArrayOutputStream, v: Int): Unit = writeVarLong(out, v.toLong)

  def readVarLong(in: InputStream): Long = {
    var z = 0L; var shift = 0; var b = in.read()
    while ((b & 0x80) != 0) {
      if (b < 0) throw new java.io.EOFException("truncated varint")
      z |= (b & 0x7fL) << shift; shift += 7; b = in.read()
    }
    if (b < 0) throw new java.io.EOFException("truncated varint")
    z |= (b & 0x7fL) << shift
    (z >>> 1) ^ -(z & 1) // un-zigzag
  }
  def readVarInt(in: InputStream): Int = readVarLong(in).toInt

  // —————————————————— RecordBatch v2 ——————————————————

  /**
   * Encode a magic-2 record batch. `baseSequence`/`producerId`/`producerEpoch`
   * are the idempotence triple — a broker dedupes on (pid, epoch, seq) when
   * a retry re-sends the batch (the wire half of exactly-once; the
   * coordinator RPCs are environment-bound).
   */
  def encodeBatch(records: Seq[Record], baseOffset: Long = 0L,
                  producerId: Long = -1L, producerEpoch: Short = -1,
                  baseSequence: Int = -1): Array[Byte] = {
    require(records.nonEmpty, "empty batch")
    val baseTs = records.map(_.timestampMs).min
    val maxTs = records.map(_.timestampMs).max

    val recBytes = new ByteArrayOutputStream()
    records.zipWithIndex.foreach { case (r, i) =>
      val one = new ByteArrayOutputStream()
      one.write(0) // record attributes (unused)
      writeVarLong(one, r.timestampMs - baseTs)
      writeVarInt(one, i) // offsetDelta
      if (r.key == null) writeVarInt(one, -1)
      else { writeVarInt(one, r.key.length); one.write(r.key) }
      if (r.value == null) writeVarInt(one, -1)
      else { writeVarInt(one, r.value.length); one.write(r.value) }
      writeVarInt(one, r.headers.length)
      r.headers.foreach { case (k, v) =>
        val kb = k.getBytes(UTF_8)
        writeVarInt(one, kb.length); one.write(kb)
        if (v == null) writeVarInt(one, -1)
        else { writeVarInt(one, v.length); one.write(v) }
      }
      writeVarInt(recBytes, one.size())
      one.writeTo(recBytes)
    }

    // everything the CRC covers: attributes … records
    val crcBody = ByteBuffer.allocate(2 + 4 + 8 + 8 + 8 + 2 + 4 + 4 + recBytes.size())
    crcBody.putShort(0) // attributes: no compression, no txn bit
    crcBody.putInt(records.length - 1) // lastOffsetDelta
    crcBody.putLong(baseTs)
    crcBody.putLong(maxTs)
    crcBody.putLong(producerId)
    crcBody.putShort(producerEpoch)
    crcBody.putInt(baseSequence)
    crcBody.putInt(records.length)
    crcBody.put(recBytes.toByteArray)
    val crc = new CRC32C()
    crc.update(crcBody.array(), 0, crcBody.position())

    val batchLength = 4 + 1 + 4 + crcBody.position() // leaderEpoch + magic + crc + body
    val out = ByteBuffer.allocate(8 + 4 + batchLength)
    out.putLong(baseOffset)
    out.putInt(batchLength)
    out.putInt(-1) // partitionLeaderEpoch
    out.put(2.toByte) // magic
    out.putInt(crc.getValue.toInt)
    out.put(crcBody.array(), 0, crcBody.position())
    out.array()
  }

  /** Decode + CRC-verify a magic-2 batch (spec/stub side). */
  def decodeBatch(bytes: Array[Byte]): (Long, Long, Short, Int, Seq[Record]) = {
    val buf = ByteBuffer.wrap(bytes)
    val baseOffset = buf.getLong
    val batchLength = buf.getInt
    require(batchLength == bytes.length - 12, s"batchLength $batchLength vs ${bytes.length - 12}")
    require(buf.getInt == -1 || true) // partitionLeaderEpoch (any)
    require(buf.get() == 2, "not a magic-2 batch")
    val crcStored = buf.getInt
    val crc = new CRC32C()
    crc.update(bytes, buf.position(), bytes.length - buf.position())
    require(crc.getValue.toInt == crcStored, "CRC32C mismatch")
    buf.getShort // attributes
    buf.getInt // lastOffsetDelta
    val baseTs = buf.getLong
    buf.getLong // maxTs
    val pid = buf.getLong
    val epoch = buf.getShort
    val baseSeq = buf.getInt
    val n = buf.getInt
    val in = new java.io.ByteArrayInputStream(bytes, buf.position(), bytes.length - buf.position())
    val recs = (0 until n).map { _ =>
      readVarInt(in) // record length
      in.read() // attributes
      val tsDelta = readVarLong(in)
      readVarInt(in) // offsetDelta
      def bytesOrNull(): Array[Byte] = {
        val len = readVarInt(in)
        if (len < 0) null else { val a = new Array[Byte](len); in.read(a); a }
      }
      val key = bytesOrNull()
      val value = bytesOrNull()
      val headers = (0 until readVarInt(in)).map { _ =>
        val k = new String(bytesOrNull(), UTF_8); k -> bytesOrNull()
      }
      Record(key, value, headers, baseTs + tsDelta)
    }
    (baseOffset, pid, epoch, baseSeq, recs)
  }

  // —————————————————— Produce v3 framing ——————————————————

  private def writeString(out: DataOutputStream, s: String): Unit =
    if (s == null) out.writeShort(-1)
    else { val b = s.getBytes(UTF_8); out.writeShort(b.length); out.write(b) }

  private def readString(in: DataInputStream): String = {
    val len = in.readShort()
    if (len < 0) null else { val b = new Array[Byte](len); in.readFully(b); new String(b, UTF_8) }
  }

  /** One Produce v3 request: single topic, records per partition. */
  def encodeProduceRequest(correlationId: Int, clientId: String,
                           transactionalId: String, acks: Short, timeoutMs: Int,
                           topic: String, partitionBatches: Seq[(Int, Array[Byte])]): Array[Byte] = {
    val body = new ByteArrayOutputStream()
    val d = new DataOutputStream(body)
    d.writeShort(0) // apiKey = Produce
    d.writeShort(3) // apiVersion (first with magic-2 batches)
    d.writeInt(correlationId)
    writeString(d, clientId)
    writeString(d, transactionalId)
    d.writeShort(acks)
    d.writeInt(timeoutMs)
    d.writeInt(1) // topic count
    writeString(d, topic)
    d.writeInt(partitionBatches.length)
    partitionBatches.foreach { case (partition, batch) =>
      d.writeInt(partition)
      d.writeInt(batch.length)
      d.write(batch)
    }
    d.flush()
    val framed = ByteBuffer.allocate(4 + body.size())
    framed.putInt(body.size())
    framed.put(body.toByteArray)
    framed.array()
  }

  case class PartitionAck(partition: Int, errorCode: Short, baseOffset: Long)
  case class ProduceResponse(correlationId: Int, topic: String, acks: Seq[PartitionAck])

  def readProduceResponse(in: DataInputStream): ProduceResponse = {
    val size = in.readInt()
    val buf = new Array[Byte](size)
    in.readFully(buf)
    val d = new DataInputStream(new java.io.ByteArrayInputStream(buf))
    val corr = d.readInt()
    val topicCount = d.readInt()
    require(topicCount == 1, s"expected one topic, got $topicCount")
    val topic = readString(d)
    val acks = (0 until d.readInt()).map { _ =>
      val p = d.readInt(); val err = d.readShort(); val off = d.readLong()
      d.readLong() // logAppendTime
      PartitionAck(p, err, off)
    }
    ProduceResponse(corr, topic, acks)
  }

  /** Stub/broker side: parse one Produce v3 request off the wire. */
  case class ProduceRequest(correlationId: Int, clientId: String, transactionalId: String,
                            acks: Short, topic: String, batches: Seq[(Int, Array[Byte])])

  def readProduceRequest(in: DataInputStream): ProduceRequest = {
    val size = in.readInt()
    val buf = new Array[Byte](size)
    in.readFully(buf)
    val d = new DataInputStream(new java.io.ByteArrayInputStream(buf))
    require(d.readShort() == 0 && d.readShort() == 3, "not a Produce v3 request")
    val corr = d.readInt()
    val clientId = readString(d)
    val txnId = readString(d)
    val acks = d.readShort()
    d.readInt() // timeoutMs
    require(d.readInt() == 1)
    val topic = readString(d)
    val batches = (0 until d.readInt()).map { _ =>
      val partition = d.readInt()
      val len = d.readInt()
      val b = new Array[Byte](len); d.readFully(b)
      partition -> b
    }
    ProduceRequest(corr, clientId, txnId, acks, topic, batches)
  }

  def encodeProduceResponse(resp: ProduceResponse): Array[Byte] = {
    val body = new ByteArrayOutputStream()
    val d = new DataOutputStream(body)
    d.writeInt(resp.correlationId)
    d.writeInt(1)
    writeString(d, resp.topic)
    d.writeInt(resp.acks.length)
    resp.acks.foreach { a =>
      d.writeInt(a.partition); d.writeShort(a.errorCode); d.writeLong(a.baseOffset)
      d.writeLong(-1L) // logAppendTime
    }
    d.writeInt(0) // throttle_time_ms (v1+, trails the responses array)
    d.flush()
    val framed = ByteBuffer.allocate(4 + body.size())
    framed.putInt(body.size())
    framed.put(body.toByteArray)
    framed.array()
  }

  /**
   * A [[MessagingSinks.TransactionalProducer]] over Produce v3. Buffers the
   * transaction's records; commit encodes ONE idempotently-sequenced batch
   * per topic and requires acks=-1 success on every partition.
   *
   * Delivery semantics, stated precisely: abort before commit touches the
   * wire not at all. A commit that FAILS leaves `pending` intact and does
   * NOT advance any sequence, so the caller's replay (a fresh producer for
   * the same micro-batch partition) re-sends byte-identical batches with
   * the SAME (producerId, epoch, baseSequence) — a broker's idempotent
   * dedup collapses them. Sequences are per topic (Kafka tracks them per
   * topic-partition; a shared counter would be rejected as
   * OUT_OF_ORDER_SEQUENCE_NUMBER). A multi-topic commit is therefore NOT
   * atomic mid-flight — it is idempotent-convergent: topics acked before a
   * failure are re-sent on replay and deduped. True cross-topic atomicity
   * needs the coordinator txn RPCs (EndTxn markers), which need a live
   * cluster and stay environment-bound.
   */
  class SocketProducer(host: String, port: Int, clientId: String,
                       transactionalId: String = null,
                       producerId: Long = 1L,
                       connectTimeoutMs: Int = 5000,
                       readTimeoutMs: Int = 30000)
      extends MessagingSinks.TransactionalProducer {
    private var inTx = false
    private val pending = new scala.collection.mutable.ArrayBuffer[MessagingSinks.WireRecord]()
    private val seqByTopic = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    private val corr = new java.util.concurrent.atomic.AtomicInteger(0)

    override def beginTransaction(): Unit = { require(!inTx); inTx = true }
    override def send(rec: MessagingSinks.WireRecord): Unit =
      if (inTx) pending += rec else flush(Seq(rec))
    override def abortTransaction(): Unit = { pending.clear(); inTx = false }
    override def commitTransaction(): Unit = {
      // failure does NOT clear pending or advance sequences — the replay
      // must observe the exact same (pid, epoch, seq) triple to be deduped
      if (pending.nonEmpty) flush(pending.toSeq)
      pending.clear(); inTx = false
    }

    private def flush(recs: Seq[MessagingSinks.WireRecord]): Unit = {
      val socket = new Socket()
      try {
        socket.connect(new InetSocketAddress(host, port), connectTimeoutMs)
        socket.setSoTimeout(readTimeoutMs)
        val out = new BufferedOutputStream(socket.getOutputStream, 1 << 16)
        val in = new DataInputStream(new BufferedInputStream(socket.getInputStream, 1 << 16))
        recs.groupBy(_.topic).toSeq.sortBy(_._1).foreach { case (topic, rs) =>
          val baseSeq: Int = Option(seqByTopic.get(topic)).fold(0)(_.intValue())
          val batch = encodeBatch(
            rs.map(r => Record(
              if (r.key == null) null else r.key.getBytes(UTF_8), r.value,
              r.headers.toSeq.sortBy(_._1).map { case (k, v) => k -> v.getBytes(UTF_8) })),
            producerId = producerId, producerEpoch = 0,
            baseSequence = baseSeq)
          val id = corr.incrementAndGet()
          out.write(encodeProduceRequest(id, clientId, transactionalId,
            acks = -1, timeoutMs = readTimeoutMs, topic = topic,
            partitionBatches = Seq(0 -> batch)))
          out.flush()
          val resp = readProduceResponse(in)
          require(resp.correlationId == id, s"correlation mismatch: ${resp.correlationId} vs $id")
          resp.acks.find(_.errorCode != 0).foreach { a =>
            throw new RuntimeException(
              s"produce to $topic[${a.partition}] failed: error ${a.errorCode}")
          }
          seqByTopic.put(topic, baseSeq + rs.length) // advance ONLY on ack
        }
      } finally socket.close()
    }
  }
}
