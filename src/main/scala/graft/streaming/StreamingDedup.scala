package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming dedup — the online analog of the reference
  * engine's incremental one-object-at-a-time `add`
  * (`/root/reference/lib/Data/Dedup/Engine.pm:426-430`): the reference
  * is online in spirit (SURVEY §2.5); here the state store holds the
  * canonical member per content key, and each arriving doc is either
  * the first of its block (canonical) or a duplicate of the stored
  * canonical.
  */
object StreamingDedup {

  case class Keyed(key: String, url: String)
  case class Assignment(url: String, canonical: String, is_duplicate: Boolean)

  /** Streaming exact dedup: key = content hash (any digest column the
    * caller computed — e.g. sha1(html)); state = canonical url per
    * key (min url seen, mirroring the alphabetical-min rule only
    * within arrival order: first-seen wins, like the reference's
    * insertion-ordered blocks).
    */
  def assign(spark: SparkSession, keyed: Dataset[Keyed]): Dataset[Assignment] = {
    import spark.implicits._
    keyed
      .groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[Keyed], state: GroupState[String]) =>
          val batch = rows.toSeq.sortBy(_.url)
          val canonical = state.getOption.getOrElse(batch.head.url)
          if (!state.exists) state.update(canonical)
          batch.map(k => Assignment(k.url, canonical, k.url != canonical))
      }
      .flatMap(identity)
  }

  /** Watermarked event-stream dedup + windowed counts: first event per
    * event_id within the watermark, then 5-minute windowed counts per
    * type (the readStream → watermark → window → agg shape).
    */
  def eventCounts(events: DataFrame): DataFrame =
    events
      // parquet TIMESTAMP_NTZ → session-tz TIMESTAMP (watermarks
      // require an event-time zone; session is pinned UTC)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
}
