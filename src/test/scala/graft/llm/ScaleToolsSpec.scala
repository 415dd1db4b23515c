package graft.llm

import graft.SparkSpec
import graft.functions.SpaceSaving
import org.apache.spark.sql.functions._

import java.nio.file.Files

class ScaleToolsSpec extends SparkSpec {

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
}
