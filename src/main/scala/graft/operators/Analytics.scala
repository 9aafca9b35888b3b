package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Product-analytics operators over the event log (SURVEY §2B extension):
  * ordered funnel conversion and weekly cohort retention — the two query
  * shapes every engagement pipeline runs, expressed so the heavy input
  * (the event log) is touched a constant number of times and everything
  * after the first aggregation is per-user-sized.
  *
  * Scale story: both operators reduce the event log to per-user rows with
  * map-side-combined `groupBy(user_id)` aggregations before any join, so
  * at 100 TB the joins exchange |users| rows, never |events|; the
  * `event_type` filters push down to the parquet scan.
  */
object Analytics {

  /** Ordered funnel: for every user, the first `view`, the first `click`
    * AFTER that view, and the first `purchase` AFTER that click. Stages
    * are strictly ordered (a click before the first view does not count),
    * which is what distinguishes a funnel from three independent mins —
    * each stage joins the previous stage's per-user timestamp and
    * re-minimizes, so the event log is scanned once per stage with the
    * stage's type filter pushed down, and every join key is `user_id`.
    * Users who never reach a stage keep NULL from the left joins.
    */
  def funnelConversion(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables(spark, dir, "events")
    val users = events.select(col("user_id")).distinct()
    val view = events.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val click = events.filter(col("event_type") === "click")
      .join(view, Seq("user_id"))
      .filter(col("ts") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val purchase = events.filter(col("event_type") === "purchase")
      .join(click, Seq("user_id"))
      .filter(col("ts") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    users
      .join(view, Seq("user_id"), "left")
      .join(click, Seq("user_id"), "left")
      .join(purchase, Seq("user_id"), "left")
  }

  /** Batch sessionization (gaps-and-islands): consecutive events of a
    * user belong to one session until a silence of `gapMinutes` splits
    * them; each session row carries its span and event count. The batch
    * counterpart of the streaming `session_window` queries (which pin a
    * 10-minute gap against this same SQL shape) — here via the window
    * path: one shuffle on `user_id`, then lag → new-session flag →
    * running sum, all within the one sorted partition pass, then a
    * reaggregation that reuses the same (user-keyed) partitioning.
    * Session state is never global: everything is per-user, so 100 TB of
    * events partitions to |users| independent sorted streams.
    */
  def sessionize(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    Tables(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("new_s",
        when(lag(col("ts"), 1).over(w).isNull
          || col("ts") - lag(col("ts"), 1).over(w) >= expr(s"INTERVAL $gapMinutes MINUTE"), 1)
          .otherwise(0))
      .withColumn("session_idx",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** Weekly cohort retention: users are cohorted by the ISO week of their
    * first event, and each (cohort_week, week_offset) cell counts the
    * cohort's users active that many weeks later. The event log collapses
    * to DISTINCT (user_id, week) first — one map-side-combined exchange —
    * so the cohort join and the final cell aggregation both run on
    * ≤ |users| × |weeks| rows regardless of raw event volume.
    */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val weekly = Tables(spark, dir, "events")
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("week"))
      .distinct()
    val cohort = weekly.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    weekly.join(cohort, Seq("user_id"))
      .withColumn("week_offset", (datediff(col("week"), col("cohort_week")) / 7).cast("int"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
