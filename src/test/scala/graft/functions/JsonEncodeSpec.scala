package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JsonEncodeSpec extends SparkSpec {

  import graft.operators.Envelopes

  test("fused envelope encode is byte-identical to to_json on adversarial events") {
    import spark.implicits._
    val ctrl = (0 until 32).map(_.toChar).mkString
    val nasty = Seq(
      ctrl, "\"quoted\" and \\back\\slash\\", "é中🎉 😀 mixed",
      "/slashes/are/raw/", "", "plain", "{\"embedded\":\"json\",\"n\":1}",
      "tab\there\nnewline", " del", null
    )
    // sweep every nasty string through before/after/event_id, null-cycle
    // the rest, and exercise tags shapes incl. null elements + empty
    val rows = nasty.zipWithIndex.flatMap { case (s, i) =>
      Seq(
        (s, nasty((i + 1) % nasty.length), s"ev$i", "c", 1000L + i,
          if (i % 3 == 0) null else s"t$i", if (i % 2 == 0) null else s"sv$i",
          if (i % 4 == 0) null else Seq(s"tag$i", null, ""),
          i % 5 != 0),
        (null, s, null, "u", -1L - i, null, null, Seq.empty[String], false)
      )
    }
    val df = rows.toDF("before", "after", "event_id", "op", "ts_ms",
      "tenant_id", "schema_version", "tags", "snapshot")
      .select(col("before"), col("after"),
        struct(
          lit("graft-0.1.0").as("version"), lit("mysql").as("connector"),
          when(col("snapshot"), lit(null).cast("string")).otherwise(lit("db1")).as("name"),
          col("ts_ms").as("ts_ms"), lit("inventory").as("db"),
          lit(null).cast("string").as("schema"), lit("orders").as("table"),
          col("snapshot").as("snapshot"), lit(7L).as("server_id"),
          lit(null).cast("string").as("gtid"), col("event_id").as("file"),
          col("ts_ms").as("pos"), lit(null).cast("string").as("lsn"),
          lit(3L).as("tx_id"), lit(9L).as("sequence")).as("source"),
        col("op"), col("ts_ms"),
        when(col("snapshot"),
          struct(col("event_id").as("id"), col("ts_ms").as("total_order"),
            lit(null).cast("long").as("data_collection_order")))
          .otherwise(lit(null)).as("transaction"),
        col("event_id"), col("tenant_id"), col("schema_version"),
        when(col("snapshot"), col("ts_ms")).otherwise(lit(null)).as("schema_sequence"),
        col("tags"))
    val cmp = df.select(Envelopes.native.as("fused"),
      Envelopes.nativeViaToJson.as("jackson")).collect()
    cmp.zipWithIndex.foreach { case (r, i) =>
      assert(r.getString(0) == r.getString(1),
        s"row $i diverged:\n fused=${r.getString(0)}\n jackson=${r.getString(1)}")
    }
  }

  test("struct-row path (materialized struct COLUMN) matches to_json too") {
    import spark.implicits._
    // a struct-typed column (not a literal struct(...) constructor) routes
    // through FusedJsonEncode's struct-row path — keep it pinned as well
    val df = Seq(("a\"b", 1L, true), (null, -2L, false), ("é🎉", 0L, true))
      .toDF("s", "n", "b")
      .select(struct(col("s"), col("n"), col("b"),
        struct(col("s").as("inner"), lit(null).cast("string").as("z")).as("nest"),
        array(col("s"), lit(null).cast("string")).as("arr")).as("row"))
      .select(col("row")) // materialized struct column, then encode it
    val cmp = df.select(
      graft.functions.JsonEncode.fusedJson(col("row")).as("fused"),
      to_json(col("row")).as("jackson")).collect()
    cmp.foreach(r => assert(r.getString(0) == r.getString(1),
      s"diverged:\n fused=${r.getString(0)}\n jackson=${r.getString(1)}"))
  }

  test("fused envelope encode matches to_json on a seeded random corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    def rndStr(): String = {
      val len = rnd.nextInt(40)
      val sb = new StringBuilder
      (0 until len).foreach { _ =>
        rnd.nextInt(6) match {
          case 0 => sb.append(rnd.nextPrintableChar())
          case 1 => sb.append((rnd.nextInt(0x20)).toChar) // control
          case 2 => sb.append(if (rnd.nextBoolean()) '"' else '\\')
          case 3 => sb.append("中文éß")
          case 4 => sb.append(new String(Character.toChars(0x1F300 + rnd.nextInt(0xff))))
          case _ => sb.append(('a' + rnd.nextInt(26)).toChar)
        }
      }
      sb.toString
    }
    def opt[T](v: => T): T = if (rnd.nextInt(4) == 0) null.asInstanceOf[T] else v
    val rows = (0 until 500).map { _ =>
      (opt(rndStr()), opt(rndStr()), rndStr(), opt(rndStr()),
        rnd.nextLong(), opt(Seq.fill(rnd.nextInt(3))(opt(rndStr()))))
    }
    val df = rows.toDF("before", "after", "event_id", "tenant_id", "ts_ms", "tags")
      .select(col("before"), col("after"),
        struct(lit("v").as("version"), col("event_id").as("name")).as("source"),
        lit("c").as("op"), col("ts_ms"), lit(null).cast("string").as("transaction"),
        col("event_id"), col("tenant_id"),
        lit(null).cast("string").as("schema_version"),
        lit(null).cast("long").as("schema_sequence"), col("tags"))
    val cmp = df.select(Envelopes.native.as("fused"),
      Envelopes.nativeViaToJson.as("jackson")).collect()
    cmp.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"diverged:\n fused=${r.getString(0)}\n jackson=${r.getString(1)}")
    }
  }

  test("decimal/binary/short/byte leaves match to_json byte-for-byte") {
    import spark.implicits._
    // decimals across scales incl. the BigDecimal scientific-notation zone
    // (adjusted exponent < -6 → "1E-8", like the builtin), binary → base64
    val df = Seq(
      ("1234567890.12", "0.00000001", 1.toShort, 2.toByte, Array[Byte](0, 1, -1, 127)),
      ("-0.01", "-0.00000042", Short.MinValue, Byte.MaxValue, Array.empty[Byte]),
      ("0", "0.10000000", Short.MaxValue, Byte.MinValue, Array[Byte](-34, -83))
    ).toDF("dec_s", "tiny_s", "sh", "by", "bin")
      .select(col("dec_s").cast("decimal(15,2)").as("d1"),
        col("tiny_s").cast("decimal(12,8)").as("d2"),
        col("sh"), col("by"), col("bin"))
    val payload = struct(col("d1"), col("d2"), col("sh"), col("by"), col("bin"))
    val cmp = df.select(
      graft.functions.JsonEncode.fusedJson(payload).as("fused"),
      to_json(payload).as("jackson")).collect()
    cmp.foreach(r => assert(r.getString(0) == r.getString(1),
      s"diverged:\n fused=${r.getString(0)}\n jackson=${r.getString(1)}"))
    // struct-row path too
    val cmp2 = df.select(payload.as("row"))
      .select(graft.functions.JsonEncode.fusedJson(col("row")).as("fused"),
        to_json(col("row")).as("jackson")).collect()
    cmp2.foreach(r => assert(r.getString(0) == r.getString(1),
      s"struct-row diverged:\n fused=${r.getString(0)}\n jackson=${r.getString(1)}"))
  }

  test("unsupported leaf types fall back to builtin to_json, not analysis failure") {
    import spark.implicits._
    // map leaves are outside the fused lattice → fusedJsonFor routes the
    // whole struct through the builtin (ADVICE r13: CdcSynth whole-table
    // payloads must not TypeCheckFailure on exotic columns)
    val df = Seq((1L, Map("a" -> 1, "b" -> 2))).toDF("id", "m")
    val payload = struct(col("id"), col("m"))
    val out = df.select(
      graft.functions.JsonEncode.fusedJsonFor(payload, df.select(col("id"), col("m")).schema).as("fused"),
      to_json(payload).as("jackson")).collect()
    assert(out.head.getString(0) == out.head.getString(1))
    // and the full CdcSynth path over a map-bearing table keeps working
    val events = graft.sources.CdcSynth.changeEvents(df, "db1", "t1", "id")
    assert(events.select("after").collect().forall(!_.isNullAt(0) || true))
  }

  test("template codegen COMPILES with null typed-literal leaves (no interpreter fallback)") {
    import spark.implicits._
    // Null primitive literals codegen their value as the type default
    // ("-1L" for long): the old boxing cast `(java.lang.Long) -1L` hits
    // the Java cast/minus grammar ambiguity — Janino reads a BINARY MINUS
    // off a class name, compilation fails, and the whole projection
    // silently drops to interpreter mode. The byte-parity specs above
    // can't see that (interpreted output is still correct, just ~4x
    // slower — the entire r16 "fused encode regresses the drain 30%"
    // signal). CODEGEN_ONLY + fallback=false make the compile error
    // throw instead.
    val priorFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val priorFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      spark.conf.set("spark.sql.codegen.fallback", "false")
      val df = Seq((1L, "x")).toDF("id", "s")
      val payload = struct(
        col("id"), col("s"),
        lit(null).cast("long").as("nl"),
        lit(null).cast("int").as("ni"),
        lit(null).cast("double").as("nd"),
        lit(null).cast("boolean").as("nb"),
        lit(null).cast("string").as("ns"))
      val out = df.select(
        graft.functions.JsonEncode.fusedJson(payload).as("fused"),
        to_json(payload).as("jackson")).collect().head
      assert(out.getString(0) == out.getString(1),
        s"fused=${out.getString(0)} builtin=${out.getString(1)}")
    } finally {
      priorFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      priorFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }

  test("session time zone is resolved at analysis, like to_json") {
    import spark.implicits._
    val prior = spark.conf.get("spark.sql.session.timeZone")
    try {
      val df = Seq("2026-03-01 12:34:56.789").toDF("s")
        .select(col("s").cast("timestamp").as("ts"))
      val payload = struct(col("ts"))
      // build the columns FIRST, change the session zone, THEN execute —
      // both sides must format with the zone in force at analysis time
      val fused = graft.functions.JsonEncode.fusedJson(payload)
      val builtin = to_json(payload)
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      val out = df.select(fused.as("f"), builtin.as("j")).collect().head
      assert(out.getString(0) == out.getString(1),
        s"fused=${out.getString(0)} builtin=${out.getString(1)}")
      assert(out.getString(0).contains("+09:00"),
        s"expected Tokyo offset in ${out.getString(0)}")
    } finally spark.conf.set("spark.sql.session.timeZone", prior)
  }

  test("double/float/timestamp/date leaves match to_json byte-for-byte") {
    import spark.implicits._
    // the CdcSynth payload shape: typed table columns through fusedJson —
    // doubles across magnitudes/specials, floats, µs-precision timestamps
    // (with and without zone), dates
    val doubles = Seq(0.0, -0.0, 1.5, -4.5e2, 1.0e300, -1.7976931348623157e308,
      5e-324, 0.1, 1.0000000000000002, 123456.789, Double.NaN,
      Double.PositiveInfinity, Double.NegativeInfinity)
    val rows = doubles.zipWithIndex.map { case (d, i) =>
      (i.toLong, d, d.toFloat,
        f"2026-${1 + i % 9}%02d-${1 + i % 28}%02d ${i % 24}%02d:${i % 60}%02d:${(i * 7) % 60}%02d.12345${i % 9}",
        f"${1970 + i}%04d-${1 + i % 9}%02d-${1 + i % 28}%02d")
    }
    val df = rows.toDF("id", "d", "f", "ts_s", "date_s")
      .select(col("id"), col("d"), col("f"),
        col("ts_s").cast("timestamp").as("ts"),
        col("ts_s").cast("timestamp_ntz").as("tsntz"),
        col("date_s").cast("date").as("dt"))
    val payload = struct(col("id"), col("d"), col("f"), col("ts"),
      col("tsntz"), col("dt"))
    val cmp = df.select(
      graft.functions.JsonEncode.fusedJson(payload).as("fused"),
      to_json(payload).as("jackson")).collect()
    cmp.foreach(r => assert(r.getString(0) == r.getString(1),
      s"diverged:\n fused=${r.getString(0)}\n jackson=${r.getString(1)}"))
    // struct-row path too (non-constructor input)
    val cmp2 = df.select(payload.as("row")).select(col("row"))
      .select(graft.functions.JsonEncode.fusedJson(col("row")).as("fused"),
        to_json(col("row")).as("jackson")).collect()
    cmp2.foreach(r => assert(r.getString(0) == r.getString(1),
      s"struct-row diverged:\n fused=${r.getString(0)}\n jackson=${r.getString(1)}"))
  }

  test("array(...) constructors template (r17): byte-identical and fully unrolled into leaves") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // the cdc_nested_decode payload shape: nested struct + array<long> +
    // array<struct<k,v>>, with nullable leaves exercising the null rules
    // (object field OMITTED, array element written as `null`)
    val df = Seq(
      (1L, 10L, "F", 1.5, "1-URGENT"),
      (2L, -3L, null.asInstanceOf[String], -0.0, "a\"b\\c\n"),
      (3L, 0L, "é🎉", Double.NaN, null.asInstanceOf[String])
    ).toDF("k", "ck", "status", "price", "prio")
    val sch = StructType(Seq(
      StructField("order", StructType(Seq(
        StructField("id", LongType), StructField("status", StringType),
        StructField("price", DoubleType)))),
      StructField("items", ArrayType(LongType)),
      StructField("attrs", ArrayType(StructType(Seq(
        StructField("k", StringType), StructField("v", StringType)))))))
    def payload = struct(
      struct(col("k").as("id"), col("status").as("status"), col("price").as("price")).as("order"),
      array(col("k"), col("ck"), pmod(col("k"), lit(7))).as("items"),
      array(
        struct(lit("prio").as("k"), col("prio").as("v")),
        struct(lit("stat").as("k"), col("status").as("v"))).as("attrs"))
    val fusedCol = graft.functions.JsonEncode.fusedJsonFor(payload, sch)
    // the template must ENGAGE and unroll array/struct constructors into
    // SCALAR leaves — a boxed array<struct> leaf is exactly the r16
    // regression (codegen materialized a GenericArrayData of rows per row)
    val expr = org.apache.spark.sql.classic.GraftBridge.eagerExpression(fusedCol)
    assert(expr.isInstanceOf[graft.functions.JsonEncode.FusedJsonTemplate],
      s"expected the template path, got ${expr.getClass}")
    assert(expr.children.length == 10, // 3 order + 3 items + 4 attrs leaves
      s"expected 10 scalar leaves, got ${expr.children.length}: ${expr.children}")
    assert(expr.children.forall(c =>
      !c.isInstanceOf[org.apache.spark.sql.catalyst.expressions.CreateArray] &&
        !c.isInstanceOf[org.apache.spark.sql.catalyst.expressions.CreateNamedStruct]),
      s"constructor leaked through as a boxed leaf: ${expr.children}")
    val cmp = df.select(fusedCol.as("fused"), to_json(payload).as("jackson")).collect()
    cmp.foreach(r => assert(r.getString(0) == r.getString(1),
      s"diverged:\n fused=${r.getString(0)}\n jackson=${r.getString(1)}"))
  }

  test("declared-schema field name contradicting an argument alias falls back to to_json") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // ADVICE r16 #2: only arity was checked — a renamed alias silently
    // emitted the STALE schema name, diverging from the to_json fallback.
    // Now a mismatch routes to builtin (the caller's own names win).
    val df = Seq((1L, "x")).toDF("id", "s")
    val mismatched = graft.functions.JsonEncode.fusedJsonFor(
      struct(col("id").as("renamed"), col("s").as("s")),
      StructType(Seq(StructField("id", LongType), StructField("s", StringType))))
    val out = df.select(mismatched.as("j")).collect().head.getString(0)
    assert(out == """{"renamed":1,"s":"x"}""",
      s"mismatched alias must fall back to to_json's own names, got $out")
    // attribute-name mismatch falls back the same way
    val mismatchedAttr = graft.functions.JsonEncode.fusedJsonFor(
      struct(col("id"), col("s")),
      StructType(Seq(StructField("key", LongType), StructField("s", StringType))))
    val out2 = df.select(mismatchedAttr.as("j")).collect().head.getString(0)
    assert(out2 == """{"id":1,"s":"x"}""", s"got $out2")
  }
}
