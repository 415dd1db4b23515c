package graft.streaming

import org.scalacheck.{Gen, Prop, Properties}

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

/**
 * Property tests for the wire codecs (RESP2, NATS framing, RowBinary
 * varints) — generated inputs round-trip through encode → parse, including
 * binary-unsafe bytes, so framing never depends on payload content.
 */
object WireCodecProps extends Properties("graft.wire") {

  private val binArg: Gen[Array[Byte]] =
    Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
  private val word: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(16))

  property("RESP2: any command of binary-unsafe args round-trips") =
    Prop.forAll(Gen.nonEmptyListOf(binArg)) { args =>
      val out = new ByteArrayOutputStream()
      RedisWire.Resp.encodeCommand(out, args)
      RedisWire.Resp.parseReply(new ByteArrayInputStream(out.toByteArray)) match {
        case RedisWire.Resp.Arr(items) =>
          items.length == args.length &&
            items.zip(args).forall {
              case (RedisWire.Resp.Bulk(b), a) => java.util.Arrays.equals(b, a)
              case _ => false
            }
        case _ => false
      }
    }

  property("RESP2: pipelined commands parse back in order") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.nonEmptyListOf(binArg))) { cmds =>
      val out = new ByteArrayOutputStream()
      cmds.foreach(RedisWire.Resp.encodeCommand(out, _))
      val in = new ByteArrayInputStream(out.toByteArray)
      cmds.forall { cmd =>
        RedisWire.Resp.parseReply(in) match {
          case RedisWire.Resp.Arr(items) => items.length == cmd.length
          case _ => false
        }
      } && in.read() == -1 // nothing left over — framing is exact
    }

  property("NATS: HPUB frame lengths are exact for any headers and payload") =
    Prop.forAll(word, word, Gen.mapOf(Gen.zip(word, word)), binArg) {
      (subject, msgId, headers, payload) =>
        val frame = NatsWire.hpubFrame(subject, msgId, "", headers, payload)
        val text = new String(frame, UTF_8)
        val firstLine = text.takeWhile(_ != '\r')
        val Array(_, subj, hlen, tlen) = firstLine.split(" ")
        val headerStart = firstLine.length + 2
        val hdrBlock = new String(frame, headerStart, hlen.toInt, UTF_8)
        val gotPayload = frame.slice(headerStart + hlen.toInt, headerStart + tlen.toInt)
        subj == subject &&
          tlen.toInt == hlen.toInt + payload.length &&
          hdrBlock.startsWith("NATS/1.0\r\n") && hdrBlock.endsWith("\r\n\r\n") &&
          hdrBlock.contains(s"Nats-Msg-Id: $msgId\r\n") &&
          java.util.Arrays.equals(gotPayload, payload) &&
          frame.length == headerStart + tlen.toInt + 2 // trailing CRLF, nothing more
    }

  property("Kafka: zigzag varlong round-trips any long") =
    Prop.forAll(Gen.long) { n =>
      val out = new ByteArrayOutputStream()
      KafkaWire.writeVarLong(out, n)
      val in = new ByteArrayInputStream(out.toByteArray)
      KafkaWire.readVarLong(in) == n && in.read() == -1
    }

  property("Kafka: record batch v2 round-trips arbitrary records, CRC intact") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.zip(binArg, binArg, Gen.choose(0L, 1L << 40)))) { rs =>
      val recs = rs.map { case (k, v, ts) => KafkaWire.Record(k, v, Nil, ts) }
      val (_, _, _, _, got) = KafkaWire.decodeBatch(
        KafkaWire.encodeBatch(recs, producerId = 5L, producerEpoch = 1, baseSequence = 9))
      got.length == recs.length && got.zip(recs).forall { case (g, r) =>
        java.util.Arrays.equals(g.key, r.key) &&
          java.util.Arrays.equals(g.value, r.value) && g.timestampMs == r.timestampMs
      }
    }

  property("RowBinary: LEB128 var-uint round-trips any non-negative long") =
    Prop.forAll(Gen.choose(0L, Long.MaxValue)) { n =>
      val out = new ByteArrayOutputStream()
      ClickHouseWire.RowBinary.writeVarUInt(out, n)
      val in = new ByteArrayInputStream(out.toByteArray)
      var shift = 0
      var got = 0L
      var b = in.read()
      while ((b & 0x80) != 0) { got |= (b & 0x7fL) << shift; shift += 7; b = in.read() }
      got |= (b & 0x7fL) << shift
      got == n && in.read() == -1
    }
}
