package graft.sources

import org.scalacheck.{Gen, Prop, Properties}

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream}

/**
 * Property round-trips for the live-socket protocol codecs: MySQL packet
 * framing / handshake / COM_BINLOG_DUMP_GTID and the Kafka coordinator
 * RPCs — encode∘decode must be identity over generated inputs (binary-
 * unsafe strings, empty sets, boundary lengths).
 */
object WireCodecProps extends Properties("graft.wirecodecs") {
  import MysqlWire._

  private val bytesGen: Gen[Array[Byte]] =
    Gen.choose(0, 4096).flatMap(n => Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)))
      .map(_.toArray)
  private val nameGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(32))

  property("mysql packet framing round-trips any payload and sequence") =
    Prop.forAll(bytesGen, Gen.choose(0, 255)) { (payload, seq) =>
      val out = new ByteArrayOutputStream()
      writePacket(out, seq, payload)
      val (s, p) = readPacket(new ByteArrayInputStream(out.toByteArray))
      s == seq && java.util.Arrays.equals(p, payload)
    }

  property("mysql packet framing splits ≥16MB payloads and rejoins them") =
    Prop.forAll(Gen.oneOf(0xffffff - 1, 0xffffff, 0xffffff + 1,
      0xffffff + 12345, 2 * 0xffffff)) { n =>
      val payload = new Array[Byte](n)
      var i = 0
      while (i < n) { payload(i) = (i * 31 + 7).toByte; i += 1 }
      val out = new ByteArrayOutputStream()
      val next = writePacket(out, 3, payload)
      val framed = out.toByteArray
      val (s, p) = readPacket(new ByteArrayInputStream(framed))
      // every full 0xffffff chunk demands a continuation (possibly empty),
      // so the stream holds floor(n/0xffffff)+1 packets of 4-byte headers —
      // and the returned next-sequence reflects every one of them
      s == 3 && java.util.Arrays.equals(p, payload) &&
        framed.length == n + 4 * (n / 0xffffff + 1) &&
        next == 3 + (n / 0xffffff + 1)
    }

  property("mysql continuation with a skewed sequence is rejected") =
    Prop.forAll(Gen.choose(1, 250)) { skew =>
      val payload = new Array[Byte](0xffffff + 5)
      val out = new ByteArrayOutputStream()
      writePacket(out, 0, payload)
      val framed = out.toByteArray
      framed(4 + 0xffffff + 3) = ((1 + skew) & 0xff).toByte // corrupt 2nd header's seq
      Prop.throws(classOf[java.io.IOException]) {
        readPacket(new ByteArrayInputStream(framed))
      }
    }

  property("mysql greeting: nonce and plugin survive encode∘decode") =
    Prop.forAll(nameGen, Gen.choose(1L, Int.MaxValue.toLong),
      Gen.listOfN(20, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)) {
      (version, connId, nonce) =>
        val g = decodeGreeting(encodeGreeting(version, connId, nonce))
        g.serverVersion == version && g.connectionId == connId &&
          java.util.Arrays.equals(g.nonce, nonce) &&
          g.authPlugin == "mysql_native_password"
    }

  property("mysql handshake response: scramble round-trips; auth verifies") =
    Prop.forAll(nameGen, nameGen,
      Gen.listOfN(20, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)) {
      (user, password, nonce) =>
        val r = decodeHandshakeResponse(encodeHandshakeResponse(user, password, nonce))
        r.user == user &&
          java.util.Arrays.equals(r.scramble, nativePasswordScramble(password, nonce))
    }

  property("COM_BINLOG_DUMP_GTID round-trips file/pos/gtid sets") =
    Prop.forAll(nameGen, Gen.choose(4L, Long.MaxValue / 2),
      Gen.listOf(Gen.zip(Gen.uuid, Gen.choose(1L, 1000L), Gen.choose(1001L, 2000L)))) {
      (file, pos, gtids) =>
        val req = DumpRequest(101L, file, pos, gtids)
        val got = decodeBinlogDumpGtid(encodeBinlogDumpGtid(req))
        got.file == file && got.pos == pos && got.serverId == 101L && got.gtids == gtids
    }

  // —— Kafka coordinator RPCs (graft.streaming.KafkaWire) ——
  import graft.streaming.KafkaWire._

  private def dis(b: Array[Byte]) = new DataInputStream(new ByteArrayInputStream(b))

  property("kafka Metadata response round-trips brokers/topics/partitions") =
    Prop.forAll(Gen.listOf(nameGen), Gen.choose(1, 65535)) { (topics, port) =>
      val resp = MetadataResponse(7, Seq(BrokerNode(0, "127.0.0.1", port)), 0,
        topics.map(t => TopicMeta(0, t, Seq(PartitionMeta(0, 0, 0)))))
      val got = readMetadataResponse(dis(encodeMetadataResponse(resp)))
      got == resp
    }

  property("kafka InitProducerId request+response round-trip") =
    Prop.forAll(Gen.option(nameGen), Gen.choose(0L, Long.MaxValue / 2),
      Gen.choose(0, Short.MaxValue.toInt)) { (txnId, pid, epoch) =>
        val (h, d) = readRequest(dis(encodeInitProducerIdRequest(3, "cli", txnId.orNull)))
        val (gotTxn, _) = readInitProducerIdRequestBody(d)
        val resp = readInitProducerIdResponse(dis(encodeInitProducerIdResponse(
          InitProducerIdResponse(3, 0, pid, epoch.toShort))))
        h.apiKey == 22 && gotTxn == txnId.orNull &&
          resp.producerId == pid && resp.producerEpoch == epoch.toShort
    }

  property("kafka AddPartitionsToTxn + EndTxn round-trip") =
    Prop.forAll(nameGen, Gen.choose(0L, Long.MaxValue / 2),
      Gen.listOf(Gen.zip(nameGen, Gen.nonEmptyListOf(Gen.choose(0, 64)))),
      Gen.oneOf(true, false)) { (txnId, pid, topics0, committed) =>
        val topics = topics0.map { case (t, ps) => (t, ps: Seq[Int]) }
        val apReq = AddPartitionsToTxnRequest(txnId, pid, 3, topics)
        val (h1, d1) = readRequest(dis(encodeAddPartitionsToTxnRequest(9, "cli", apReq)))
        val gotAp = readAddPartitionsToTxnRequestBody(d1)
        val etReq = EndTxnRequest(txnId, pid, 3, committed)
        val (h2, d2) = readRequest(dis(encodeEndTxnRequest(10, "cli", etReq)))
        val gotEt = readEndTxnRequestBody(d2)
        h1.apiKey == 24 && gotAp == apReq && h2.apiKey == 26 && gotEt == etReq
    }

  // —— PG wire ——
  import graft.sources.{PgWire => PW}

  property("pg startup message round-trips parameters") =
    Prop.forAll(Gen.listOf(Gen.zip(nameGen, nameGen))) { params0 =>
      val params = params0.toMap.toSeq // unique keys
      val out = new ByteArrayOutputStream()
      PW.writeStartup(out, params :+ ("replication" -> "database"))
      val got = PW.readStartup(new ByteArrayInputStream(out.toByteArray))
      got == (params :+ ("replication" -> "database")).toMap
    }

  property("pg LSN formatting round-trips") =
    Prop.forAll(Gen.choose(0L, Long.MaxValue)) { lsn =>
      PW.parseLsn(PW.lsnToString(lsn)) == lsn
    }

  property("pg status update round-trips through CopyData bytes") =
    Prop.forAll(Gen.choose(0L, Long.MaxValue / 2), Gen.choose(0L, Long.MaxValue / 2),
      Gen.choose(0L, Long.MaxValue / 2)) { (w, f, a) =>
        PW.decodeStatusUpdate(PW.statusUpdate(w, f, a)) == PW.StatusUpdate(w, f, a)
    }
}
