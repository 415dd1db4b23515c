package graft

import graft.sources.{MysqlBinlog, MysqlBinlogFixture, PgOutput, PgOutputFixture}

/**
 * Off-Spark single-thread profile of the CDC wire encode/decode hot loops —
 * the r16 instrument for the two ×10 task-CPU leaders (`cdc_binlog_decode`,
 * `cdc_pgoutput_decode`). Runs the EXACT fixture encode and wire decode the
 * queries run inside `mapPartitions`, minus Spark, so a JFR recording
 * attributes cycles to decode terms instead of Tungsten noise, and a
 * bytes/cycle figure can be stated against the memory-bandwidth floor.
 *
 * Usage: java -cp <classes>:<spark jars> graft.DecodeProfile [rows] [reps]
 * Prints per-phase ns/row and MB/s (segment bytes per wall second).
 */
object DecodeProfile {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 200000
    val reps = if (args.length > 1) args(1).toInt else 5

    // deterministic source tuples, same shape the queries project from orders
    val src: Array[(Long, Long, String, Double, Long, String)] =
      Array.tabulate(rows) { i =>
        val pk = i.toLong
        (pk, pk % 15000, if (pk % 3 == 0) "O" else "F",
          (pk % 100000) / 100.0 + 1.01, 1700000000000L + pk * 1000L,
          "PRIO-" + (pk % 5))
      }

    def time[A](label: String, segBytes: => Long)(body: => A): A = {
      var out: A = body // warmup rep
      val t0 = System.nanoTime()
      var i = 1
      while (i < reps) { out = body; i += 1 }
      val sec = (System.nanoTime() - t0) / 1e9 / math.max(1, reps - 1)
      val mb = segBytes / 1e6
      println(f"$label%-22s ${sec * 1e9 / rows}%8.1f ns/row  ${mb / sec}%8.1f MB/s  ($sec%.3f s/rep)")
      out
    }

    // ——— MySQL binlog ———
    val names = MysqlBinlogFixture.ordersCols.map(_.name).toIndexedSeq
    var mysqlSegs: Array[Array[Byte]] = null
    mysqlSegs = time("mysql_encode", if (mysqlSegs == null) 0L else mysqlSegs.map(_.length.toLong).sum) {
      src.grouped(MysqlBinlogFixture.SegmentRows)
        .map(g => MysqlBinlogFixture.ordersSegment(g.iterator)).toArray
    }
    val mysqlBytes = mysqlSegs.map(_.length.toLong).sum
    println(f"mysql segment bytes: $mysqlBytes%,d (${mysqlBytes.toDouble / rows}%.1f B/row)")
    val nRec = time("mysql_decode", mysqlBytes) {
      var n = 0L
      mysqlSegs.foreach { seg => n += MysqlBinlog.decodeSegment(seg, (_, _) => names).size }
      n
    }
    println(s"mysql decoded records: $nRec")

    // ——— PG pgoutput ———
    var pgSegs: Array[Array[Byte]] = null
    pgSegs = time("pg_encode", if (pgSegs == null) 0L else pgSegs.map(_.length.toLong).sum) {
      src.grouped(MysqlBinlogFixture.SegmentRows)
        .map(g => PgOutputFixture.ordersSegment(g.iterator)).toArray
    }
    val pgBytes = pgSegs.map(_.length.toLong).sum
    println(f"pg segment bytes: $pgBytes%,d (${pgBytes.toDouble / rows}%.1f B/row)")
    val nPg = time("pg_decode", pgBytes) {
      var n = 0L
      pgSegs.foreach { seg => n += PgOutput.decodeSegment(seg).size }
      n
    }
    println(s"pg decoded records: $nPg")
  }
}
