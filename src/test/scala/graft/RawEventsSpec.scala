package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import graft.projection.EventsReplay

/** The events reader must adapt to every ts layout the driver has
  * shipped: plain timestamp[us] (⇒ TIMESTAMP_NTZ), BIGINT nanos (the
  * ScaleUp output layout), and — historically — parquet TIMESTAMP(NANOS).
  * All three must resolve to the SAME TimestampType instants under the
  * UTC session timezone; a layout drift here silently knocks out the
  * whole temporal/versioning query family (round-8 lesson: BENCH_r08
  * recorded DATATYPE_MISMATCH for 18 queries when the driver moved from
  * nanos to µs). */
class RawEventsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeAndRead(dir: String, df: org.apache.spark.sql.DataFrame) = {
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    EventsReplay.rawEvents(spark, dir)
  }

  test("timestamp[us] and BIGINT-nanos layouts resolve to identical instants") {
    val base = java.time.Instant.parse("2024-01-05T12:34:56.789012Z")
    val rows = Seq(0L, 1L, 2L).map { i =>
      (i, base.plusSeconds(i * 60), i % 2, "click", 1.5 * i, "{}")
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_rawev").toString

    // layout A: proper timestamp column (what the driver ships now)
    val tsDf = rows.map { case (id, inst, u, t, v, p) =>
      (id, java.sql.Timestamp.from(inst), u, t, v, p)
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val a = writeAndRead(s"$tmp/us", tsDf)

    // layout B: BIGINT nanoseconds (ScaleUp-written stores from the
    // nanos era; values are µs-precision so DIV 1000 is lossless)
    val longDf = rows.map { case (id, inst, u, t, v, p) =>
      (id, inst.getEpochSecond * 1000000000L + inst.getNano, u, t, v, p)
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val b = writeAndRead(s"$tmp/nanos", longDf)

    for (df <- Seq(a, b))
      assert(df.schema("ts").dataType == TimestampType, df.schema("ts").dataType)

    val va = a.select("event_id", "ts").collect().map(r => (r.getLong(0), r.getTimestamp(1))).toMap
    val vb = b.select("event_id", "ts").collect().map(r => (r.getLong(0), r.getTimestamp(1))).toMap
    assert(va == vb)
    assert(va(0L) == java.sql.Timestamp.from(base))

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  test("the real testdata events table reads with µs-exact TIMESTAMP ts") {
    val ev = EventsReplay.rawEvents(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType == TimestampType)
    val n = ev.where(col("ts").isNull).count()
    assert(n == 0)
    // the generator spans Jan 2024; a tz-shifted read would fall outside
    val bounds = ev.agg(min("ts"), max("ts")).collect()(0)
    val (lo, hi) = (bounds.getTimestamp(0), bounds.getTimestamp(1))
    assert(!lo.before(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    assert(!hi.after(java.sql.Timestamp.valueOf("2024-01-31 00:00:00")))
  }
}
