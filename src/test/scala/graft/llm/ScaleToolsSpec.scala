package graft.llm

import graft.SparkSpec
import graft.functions.SpaceSaving
import org.apache.spark.sql.functions._

import java.nio.file.Files

class ScaleToolsSpec extends SparkSpec {

  test("driftTyped emits all six reference drift kinds with exact counts") {
    import graft.streaming.SchemaSensing.{driftTyped, DeclaredColumn}
    import spark.implicits._
    // 10 rows engineered so every kind fires a known number of times:
    //  - name: strings into declared int -> type_mismatch x10
    //  - score: floats into declared int -> type_mismatch x10; range [0,5]
    //    violated on 3 rows -> value_out_of_range x3
    //  - qty: QUOTED "123" into bigint -> type_mismatch (string) x10 — the
    //    quoting-preserved probe (get_json_object would misread it as int)
    //  - meta: json with two distinct key-sets -> json_structure_change n=2
    //  - req: non-nullable, explicit null on 4 rows -> unexpected_null x4
    //  - extra_key: present on 2 rows, undeclared -> undeclared_column x2
    //  - never: declared NON-NULLABLE, absent everywhere -> missing_column
    //    ONLY (absent keys never fire unexpected_null — reference
    //    observe_row records explicit nulls only)
    val payloads = (1 to 10).map { i =>
      val req = if (i <= 4) ""","req":null""" else s""","req":$i"""
      val extra = if (i <= 2) ""","extra_key":true""" else ""
      val meta = if (i % 2 == 0) """{"a":1}""" else """{"a":1,"b":2}"""
      val score = if (i <= 3) i + 10.5 else i / 10.0
      s"""{"name":"n$i","score":$score,"qty":"123","meta":$meta$req$extra}"""
    }
    val batch = payloads.toDF("after")
    val out = driftTyped(batch, col("after"), Seq(
      DeclaredColumn("name", "int"),
      DeclaredColumn("score", "int", minValue = Some(0.0), maxValue = Some(5.0)),
      DeclaredColumn("qty", "bigint"),
      DeclaredColumn("meta", "json"),
      DeclaredColumn("req", "bigint", nullable = false),
      DeclaredColumn("never", "varchar", nullable = false)))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(4))).toSet
    assert(out == Set(
      ("name", "type_mismatch", 10L),
      ("score", "type_mismatch", 10L),
      ("score", "value_out_of_range", 3L),
      ("qty", "type_mismatch", 10L),
      ("meta", "json_structure_change", 2L),
      ("req", "unexpected_null", 4L),
      ("extra_key", "undeclared_column", 2L),
      ("never", "missing_column", 10L)))
  }

  test("typeMismatchKind follows the reference decision table") {
    import graft.streaming.SchemaSensing.typeMismatchKind
    import spark.implicits._
    val cats = Seq("bool", "int", "float", "string", "object_or_array",
      "null", "missing").toDF("obs")
    def kinds(sqlType: String): Seq[String] =
      cats.select(col("obs"), typeMismatchKind(col("obs"), sqlType).as("k"))
        .collect().map(r => s"${r.getString(0)}=${Option(r.getString(1)).getOrElse("ok")}")
        .toSeq
    // ints fit float columns; floats never fit int columns; strings only
    // clash with strictly-numeric; objects only fit json; null/missing never
    assert(kinds("bigint") == Seq("bool=bool", "int=ok", "float=float",
      "string=string", "object_or_array=object_or_array", "null=ok", "missing=ok"))
    assert(kinds("double") == Seq("bool=bool", "int=ok", "float=ok",
      "string=string", "object_or_array=object_or_array", "null=ok", "missing=ok"))
    assert(kinds("decimal") == Seq("bool=bool", "int=ok", "float=ok",
      "string=ok", "object_or_array=object_or_array", "null=ok", "missing=ok"))
    assert(kinds("varchar") == Seq("bool=bool", "int=int", "float=ok",
      "string=ok", "object_or_array=object_or_array", "null=ok", "missing=ok"))
    assert(kinds("tinyint") == Seq("bool=ok", "int=ok", "float=float",
      "string=ok", "object_or_array=object_or_array", "null=ok", "missing=ok"))
    assert(kinds("jsonb") == Seq("bool=bool", "int=int", "float=ok",
      "string=ok", "object_or_array=ok", "null=ok", "missing=ok"))
  }

  test("spacesaving: frequent items guaranteed present, counts bounded by err") {
    import spark.implicits._
    // skewed stream: 'hot' 500×, 'warm' 200×, 100 distinct cold items 1× each
    val data = (Seq.fill(500)("hot") ++ Seq.fill(200)("warm") ++
      (1 to 100).map(i => s"cold$i"))
    val df = scala.util.Random.javaRandomToRandom(new java.util.Random(7))
      .shuffle(data).toDF("item").repartition(8)
    val ss = SpaceSaving(16)
    val row = df.agg(ss(col("item")).as("top")).head()
    val top = row.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val asMap = top.map(t => t._1 -> t).toMap
    assert(asMap.contains("hot") && asMap.contains("warm")) // freq > n/k guaranteed
    val (_, hotCount, hotErr) = asMap("hot")
    assert(hotCount >= 500 && hotCount - hotErr <= 500) // overestimate ≤ err
    val (_, warmCount, warmErr) = asMap("warm")
    assert(warmCount >= 200 && warmCount - warmErr <= 200)
  }

  test("reservoir: k distinct samples, deterministic across partitionings") {
    import graft.functions.ReservoirSample
    import spark.implicits._
    val data = (1 to 300).map(i => s"field$i") ++ Seq.fill(500)("hot") // dupes collapse
    val sample8 = data.toDF("f").repartition(8)
      .agg(ReservoirSample(50)(col("f"))).head().getSeq[String](0)
    val sample3 = data.toDF("f").repartition(3)
      .agg(ReservoirSample(50)(col("f"))).head().getSeq[String](0)
    assert(sample8.length == 50 && sample8.distinct.length == 50)
    assert(sample8 == sample3) // merge-order independent (bottom-k, not RNG)
    // uniform over distinct values: 'hot' (500×) has the same 50/301 odds as
    // any cold field — its presence is decided by hash priority alone
    val small = Seq("a", "b").toDF("f").agg(ReservoirSample(50)(col("f")))
      .head().getSeq[String](0)
    assert(small.toSet == Set("a", "b")) // under k → everything kept
  }

  test("classifier evidence pass: HLL + heavy hitters + samples in one agg") {
    import graft.streaming.SchemaSensing
    import spark.implicits._
    // stable fields id,v on every event; dynamic uuid-ish keys once each
    val rows = (1 to 100).map { i =>
      ("t1", s"""{"id":$i,"v":"x","k_$i":1}""")
    }
    val batch = rows.toDF("table", "after")
      .select(struct(col("table")).as("source"), col("after"))
    val ev = SchemaSensing.observeEvidence(batch, col("after"), sampleK = 20).head()
    assert(ev.getAs[String]("table") == "t1")
    assert(ev.getAs[Long]("n_unique_fields") >= 95) // ~102 distinct, HLL ±
    val hh = ev.getSeq[org.apache.spark.sql.Row](ev.fieldIndex("heavy_hitters"))
    assert(hh.take(2).map(_.getString(0)).toSet == Set("id", "v")) // 100× each
    val samples = ev.getSeq[String](ev.fieldIndex("sampled_fields"))
    assert(samples.length == 20 && samples.distinct.length == 20)
    // dynamic-sample evidence: stable names excluded (get_dynamic_samples)
    val dyn = Seq((samples, Seq("id", "v"))).toDF("s", "stable")
      .select(SchemaSensing.dynamicSamples(col("s"), col("stable")))
      .head().getSeq[String](0)
    assert(dyn.forall(f => f != "id" && f != "v"))
    assert(dyn.forall(_.startsWith("k_")))
  }

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    val big = (Seq.fill(1000)(1L) ++ (2L to 50L)).map(k => (k, s"v$k")).toDF("k", "payload")
    val small = (1L to 50L).map(k => (k, s"dim$k")).toDF("k", "dim")
    val plain = big.join(small, "k").select("k", "payload", "dim")
    val salted = Skew.saltedJoin(big, small, "k", salt = 8).select("k", "payload", "dim")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("hot-key monitor ranks the skewed key first") {
    import spark.implicits._
    val df = (Seq.fill(100)(7L) ++ (1L to 20L)).toDF("k")
    val top = Skew.hotKeys(df, col("k"), 3).head()
    assert(top.getAs[Long]("key") == 7L && top.getAs[Long]("n") == 101L)
  }

  test("bucketed tables join with NO shuffle exchange (co-located join)") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    s2.conf.set("spark.sql.sources.bucketing.enabled", "true")
    import s2.implicits._
    val o = (1L to 1000L).map(k => (k, k * 10.0)).toDF("key", "total")
    val l = (1L to 3000L).map(i => (i % 1000 + 1, i.toDouble)).toDF("key", "amount")
    o.write.bucketBy(8, "key").sortBy("key").mode("overwrite").saveAsTable("orders_b")
    l.write.bucketBy(8, "key").sortBy("key").mode("overwrite").saveAsTable("lineitem_b")
    val joined = s2.table("orders_b").join(s2.table("lineitem_b"), "key")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join, got:\n$plan")
    assert(joined.count() == 3000)
  }

  test("z-order layout prunes 2-d predicates via parquet row-group stats") {
    import graft.functions.ZOrder
    // 200k rows, two independent pseudo-shuffled keys in [0, 1024)
    val df = spark.range(200000).select(
      pmod(col("id") * 2654435761L, lit(1024L)).as("a"),
      pmod(col("id") * 40503L, lit(1024L)).as("b"),
      col("id"))
    val base = Files.createTempDirectory("zorder").toString
    // linear layout: clustered by `a` only — files carry full-range b stats
    df.repartitionByRange(16, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(s"$base/linear")
    // z-ordered: every file is a contiguous z-range → tight stats on BOTH
    ZOrder.cluster(df, col("a"), col("b"), 10, 16)
      .write.mode("overwrite").parquet(s"$base/zorder")

    def rowsDecoded(dir: String): Long = {
      val q = spark.read.parquet(dir).filter(col("b").between(100, 130))
      q.collect()
      val plan = q.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      plan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numOutputRows").value
      }.sum
    }
    val lin = rowsDecoded(s"$base/linear")
    val zo = rowsDecoded(s"$base/zorder")
    // same ANSWER either way…
    assert(spark.read.parquet(s"$base/linear").filter(col("b").between(100, 130)).count() ==
      spark.read.parquet(s"$base/zorder").filter(col("b").between(100, 130)).count())
    // …but the z-layout's row-group stats exclude most of the data for a
    // predicate on the SECOND dimension, while the linear layout decodes
    // everything (b is unclustered there)
    assert(lin >= 190000L, s"linear layout should decode ~everything, got $lin")
    assert(zo < lin / 2, s"z-order should decode <half of linear: z=$zo lin=$lin")
  }

  test("parquet bloom filters prune point lookups on unsorted high-cardinality keys") {
    // the complement of the z-order test: range stats can't prune a point
    // predicate on an UNSORTED high-cardinality key (every row group spans
    // ~the full domain) — a bloom filter can
    val df = spark.range(500000).select(
      pmod(col("id") * 2654435761L, lit(10000000L)).as("k"), col("id"))
    val base = Files.createTempDirectory("bloom").toString
    df.repartition(8).write
      .option("parquet.bloom.filter.enabled#k", "true")
      .option("parquet.bloom.filter.expected.ndv#k", "500000")
      .mode("overwrite").parquet(s"$base/bloom")
    df.repartition(8).write.mode("overwrite").parquet(s"$base/plain")
    // a key that exists in exactly one row → at most one row group should
    // survive the bloom check; the plain layout decodes everything
    val probe = df.filter(col("id") === 123456L).select("k").head().getLong(0)
    def rowsDecoded(dir: String): Long = {
      val q = spark.read.parquet(dir).filter(col("k") === probe)
      q.collect()
      val plan = q.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      plan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numOutputRows").value
      }.sum
    }
    val plain = rowsDecoded(s"$base/plain")
    val bloom = rowsDecoded(s"$base/bloom")
    assert(plain >= 450000L, s"plain layout should decode ~everything, got $plain")
    assert(bloom < plain / 4, s"bloom should skip most row groups: bloom=$bloom plain=$plain")
  }

  test("plan shapes of the r9 text queries: broadcast benchmark join, narrow scans") {
    // the sf0.001 tables are tiny; these assertions pin the PLAN, which is
    // what survives the 1000x scale-up
    val dir = "/root/testdata/sf0.001"
    def plan(q: String): String =
      graft.SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

    // contamination: the benchmark gram set must BROADCAST (corpus grams
    // never shuffle into a sort-merge join)
    val contam = plan("text_contamination")
    assert(contam.contains("BroadcastHashJoin"), s"expected broadcast join:\n$contam")
    assert(!contam.contains("SortMergeJoin"), s"corpus grams must not sort-merge:\n$contam")

    // pii + repetition: row-local narrow passes — the only exchange is the
    // final output sort (oracle determinism). CodegenMode renders the
    // whole-stage spans without executing (AQE keeps the executed plan
    // non-final until an action on the df's own QueryExecution).
    Seq("text_pii", "text_repetition").foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, dir)
      val p = df.queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(p).size
      assert(exchanges <= 1, s"$q should have at most the output-sort exchange:\n$p")
      val cg = df.queryExecution.explainString(org.apache.spark.sql.execution.CodegenMode)
      assert(cg.contains("WholeStageCodegen"), s"$q fell out of codegen:\n${cg.take(2000)}")
    }
  }

  test("semDedup occupancy mode: within-cell pair volume grows ~linearly at x10") {
    // r12 verdict #4: the bench query derives ~sqrt(n) cells (paper parity,
    // Theta(n^1.5) pair volume); Similarity.adaptiveCellCount(n) = ceil(n/c)
    // is the documented scale mode. This pins the claim with measured pair
    // VOLUMES: same deterministic corpus at n and 10n, cells from each rule,
    // pair volume = sum over cells of s*(s-1)/2 (exactly what the within-cell
    // cosine join schedules before any threshold).
    import graft.llm.Similarity
    val dim = 8
    def corpus(n: Int) = spark.range(n).select(
      col("id").as("vec_id"),
      array((0 until dim).map(d =>
        ((pmod(hash(col("id") * 31 + lit(d)), lit(1000)) - lit(500)) / 500.0)
          .cast("float")): _*).as("embedding"))
    def pairVolume(n: Int, cells: Long): Long = {
      val c = corpus(n)
      val stride = math.max(1L, n / cells)
      val cents = c.filter(col("vec_id") % stride === 0 && col("vec_id") < stride * cells)
        .select((col("vec_id") / stride).cast("long").as("cid"), col("embedding"))
        .collect().map(r => (r.getLong(0), r.getSeq[Number](1).map(_.doubleValue()).toSeq)).toSeq
      Similarity.ivfAssignLiteral(c, cents, idCol = "vec_id", vecCol = "embedding")
        .groupBy("centroid_id").count()
        .agg(sum((col("count") * (col("count") - 1) / 2).cast("long"))).head().getLong(0)
    }
    val n1 = 640
    val occ1 = pairVolume(n1, Similarity.adaptiveCellCount(n1))         // k = n/32
    val occ10 = pairVolume(n1 * 10, Similarity.adaptiveCellCount(n1 * 10L))
    val sqrt1 = pairVolume(n1, math.ceil(math.sqrt(n1.toDouble)).toLong) // k = sqrt(n)
    val sqrt10 = pairVolume(n1 * 10, math.ceil(math.sqrt(n1 * 10.0)).toLong)
    val occGrowth = occ10.toDouble / occ1
    val sqrtGrowth = sqrt10.toDouble / sqrt1
    // linear-with-slack for the occupancy rule; the sqrt rule must show its
    // superlinearity (n^1.5 => ~31.6x expected) and clearly exceed it
    assert(occGrowth <= 18.0,
      s"occupancy-mode pair volume grew ${occGrowth}x for 10x rows ($occ1 -> $occ10) — not linear")
    assert(sqrtGrowth > occGrowth * 1.5,
      s"sqrt-mode growth (${sqrtGrowth}x) should clearly exceed occupancy-mode (${occGrowth}x)")
  }
}
