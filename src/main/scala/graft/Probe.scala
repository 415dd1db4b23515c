package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Ad-hoc perf probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def time(name: String)(f: => Unit): Unit = {
      val c0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      f
      println(f"PROBE $name%-28s wall=${(System.nanoTime() - t0) / 1e9}%7.2f s  cpu=${(osBean.getProcessCpuTime - c0) / 1e9}%7.2f s")
    }

    // drift_types decomposition at sf0.1
    val dir = "/root/testdata/sf0.1"
    val ev = spark.read.parquet(s"$dir/events.parquet")
    time("warmup")(ev.count(): Unit)
    val ctx = when(col("event_type") === "error", lit("{\"code\":1,\"msg\":\"e\"}"))
      .when(col("event_type") === "purchase", lit("{\"amount\":2}"))
      .otherwise(lit("{\"k\":1}"))
    val payload = concat(
      lit("{\"event_type\":\""), col("event_type"), lit("\""),
      lit(",\"value\":"), col("value").cast(StringType),
      lit(",\"props\":"), col("props"),
      lit(",\"ctx\":"), ctx,
      concat(lit(",\"maybe\":"),
        when(col("user_id") % 7 =!= 0, col("user_id").cast(StringType))
          .otherwise(lit("null"))),
      when(col("event_type") === "signup", lit(",\"extra\":1")).otherwise(lit("")),
      lit("}"))
    val names = Seq("event_type", "value", "props", "ctx", "maybe", "ghost")
    val genNames = names.indices.flatMap(i => Seq(s"__v$i", s"__t$i")) :+ "__undeclared"
    def parsed = ev.select(payload.as("__p")).repartition(32)
      .select(graft.functions.JsonPathOps
        .jsonTopFields(col("__p"), names, collectUndeclared = true).as(genNames))
    import graft.streaming.SchemaSensing._
    val decl = Seq(
      DeclaredColumn("event_type", "int"),
      DeclaredColumn("value", "bigint", minValue = Some(0.0), maxValue = Some(100.0)),
      DeclaredColumn("props", "varchar"),
      DeclaredColumn("ctx", "json"),
      DeclaredColumn("maybe", "bigint", nullable = false),
      DeclaredColumn("ghost", "varchar"))
    // sub-stage variants: where do the CPU seconds go?
    val noS = lit(null).cast("string")
    def entry(name: org.apache.spark.sql.Column, kind: org.apache.spark.sql.Column,
              expected: org.apache.spark.sql.Column, observed: org.apache.spark.sql.Column,
              structure: org.apache.spark.sql.Column) =
      struct(name.as("field"), kind.as("kind"), expected.as("expected"),
        observed.as("observed"), structure.as("structure"))
    val entries = decl.zipWithIndex.flatMap { case (c, i) =>
      val v = col(s"__v$i"); val tag = col(s"__t$i")
      val obs = when(tag.isin("object", "array"), lit("object_or_array")).otherwise(tag)
      val mismatch = typeMismatchKind(obs, c.sqlType)
      val typeE = entry(lit(c.name),
        when(mismatch.isNotNull, lit("type_mismatch")).otherwise(noS),
        lit(c.sqlType), mismatch, noS)
      val nullE = if (c.nullable) Nil else Seq(entry(lit(c.name),
        when(tag === "null", lit("unexpected_null")).otherwise(noS),
        lit("NOT NULL"), lit("NULL"), noS))
      val rangeE = if (c.minValue.isEmpty && c.maxValue.isEmpty) Nil else {
        val num = v.cast("double")
        val oor = c.minValue.map(m => num < m).getOrElse(lit(false)) ||
          c.maxValue.map(m => num > m).getOrElse(lit(false))
        Seq(entry(lit(c.name),
          when(num.isNotNull && oor, lit("value_out_of_range")).otherwise(noS),
          lit("range"), lit("out_of_range"), noS))
      }
      val structE = if (!c.isJsonLike) Nil else Seq(entry(lit(c.name),
        when(tag === "object", lit("_structure")).otherwise(noS),
        lit("stable structure"), lit("n_structures"),
        to_json(array_sort(json_object_keys(v)))))
      val presenceE = entry(lit(c.name), lit("_presence"), lit("declared"),
        when(tag === "missing", lit("missing")).otherwise(lit("present")), noS)
      Seq(typeE, presenceE) ++ nullE ++ rangeE ++ structE
    }
    val undeclaredEntries = transform(col("__undeclared"), k =>
      entry(k, lit("undeclared_column"), lit("(not declared)"), lit("present"), noS))
    def exploded = parsed
      .select(explode(concat(array(entries: _*), undeclaredEntries)).as("e"))
      .select(col("e.field").as("field"), col("e.kind").as("kind"),
        col("e.expected").as("expected"), col("e.observed").as("observed"),
        col("e.structure").as("structure"))
      .filter(col("kind").isNotNull)
    for (_ <- 1 to 2) {
      time("payload-only")(ev.select(payload.as("__p")).repartition(32)
        .write.mode("overwrite").format("noop").save())
      time("parse(generate)")(parsed.write.mode("overwrite").format("noop").save())
      time("exploded-no-agg")(exploded.write.mode("overwrite").format("noop").save())
      time("agg-no-distinct")(exploded.groupBy("field", "kind", "expected", "observed")
        .agg(count(lit(1)).as("n")).write.mode("overwrite").format("noop").save())
      time("agg-with-distinct")(exploded.groupBy("field", "kind", "expected", "observed")
        .agg(count(lit(1)).as("n"), count_distinct(col("structure")).as("ns"))
        .write.mode("overwrite").format("noop").save())
      time("full driftTyped")(driftTyped(ev, payload, decl)
        .write.mode("overwrite").format("noop").save())
    }
    spark.stop()
  }
}
