package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured-Streaming ingestion of the events feed — the streaming twin
 * of [[graft.projection.EventsReplay]]. The reference has no streaming
 * surface (SURVEY §2.7); this is the Spark-native extension for a live
 * temporal graph: the same fact projection is STATELESS, so the exact
 * DataFrame transform used for batch replay runs unchanged on a stream
 * (`readStream` source in, append sink out), which is the whole point of
 * declaring the log as a derivation rather than driver-side mutation.
 */
object EventStream {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)

  /** Per-user running version state maintained with mapGroupsWithState. */
  final case class UserVersion(user_id: Long, versions: Long,
                               lastType: String, value: Option[Double])

  /** Streaming fact projection (same shape as the batch replay): works in
    * append mode because each input row maps to fact rows statelessly. */
  def factStream(events: DataFrame): DataFrame = {
    import graft.projection.FactCols._
    import graft.model.A
    val ev = events.select(
      (col("event_id") + 1).cast("long").as("tx"),
      col("ts").cast("timestamp").as("ts"),
      (lit(graft.projection.EventsReplay.VUser) + col("user_id")).cast("long").as("e"),
      col("event_type"), col("value"))
    explodeFacts(ev, Seq(
      mk(col("e"), lit("last$type.string." + A.Vertex),
        vStr = col("event_type"), tx = col("tx")),
      mk(col("e"), lit("value.double." + A.Vertex),
        vDouble = when(col("event_type") =!= "error", col("value")),
        tx = col("tx"),
        added = col("event_type") =!= "error")))
  }

  /** Watermarked tumbling-window event counts per type — late data beyond
    * the watermark is dropped, state is bounded (the streaming-agg
    * pattern the engine would run for live monitoring). */
  def windowedCounts(events: DataFrame, window: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Per-user latest state via explicit keyed state (the streaming
    * equivalent of the per-element version chain): each group folds its
    * new events in event_id order into (version count, last type, current
    * value with retraction semantics). */
  def latestPerUser(events: Dataset[Event]): Dataset[UserVersion] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserVersion, UserVersion](GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[Event], state: GroupState[UserVersion]) =>
          val prev = state.getOption.getOrElse(UserVersion(uid, 0L, null, None))
          val next = rows.toSeq.sortBy(_.event_id).foldLeft(prev) { (s, e) =>
            UserVersion(uid, s.versions + 1, e.event_type,
              if (e.event_type == "error") None else Some(e.value))
          }
          state.update(next)
          next
      }
  }
}
