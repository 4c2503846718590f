package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Event-time analytics over the `events` table — the batch semantics of
  * the streaming operators in [[graft.streaming.EventStream]] (same
  * logical aggregations; the streaming flavor adds watermarks/state).
  * The reference's only "streaming" is transport chunking with acks
  * (SURVEY.md O4) — these are the real event-time semantics it lacks.
  */
object Events {

  /** Tumbling 1-hour event-time window aggregation. Hash aggregate on
    * (window, type): map-side partials, k×types shuffle rows. */
  def hourlyAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(
        unix_micros(window(col("ts"), "1 hour").getField("start")).as("hour_us"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("sum_value"))
      .orderBy("hour_us", "event_type")

  /** Sliding event-time windows (2 h length, 1 h slide): every event
    * contributes to exactly 2 overlapping windows — Spark expands the
    * windows in a narrow projection before one hash aggregate. */
  def slidingAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(
        unix_micros(window(col("ts"), "2 hours", "1 hour").getField("start")).as("win_us"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("sum_value"))
      .orderBy("win_us", "event_type")

  /** Gap-based sessionization (gap > 30 min): per-user lag + running
    * boundary count — one shuffle keyed by user, sort within partition.
    * This is the batch twin of the stateful streaming sessionizer. */
  def sessionize(spark: SparkSession, sfDir: String, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val gapUs = gapMinutes * 60L * 1000000L
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("value"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("boundary",
        when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum("boundary").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n"),
        unix_micros(min("ts")).as("start_us"),
        unix_micros(max("ts")).as("end_us"),
        round(sum("value"), 6).as("sum_value"))
      .orderBy("user_id", "session_id")
  }

  /** Sessionization via Spark's native `session_window` — the dedicated
    * session operator (merging windows inside the aggregate) rather than
    * the lag+cumsum formulation of [[sessionize]]. Merging is
    * gap-INCLUSIVE (an event landing exactly on the previous window's
    * end still extends it — pinned in EventsSpec), so session membership
    * is identical to [[sessionize]]'s strict `> gap` boundary; only the
    * reported end differs (last_ts + gap). One shuffle keyed by
    * (user, session); state is bounded per user. */
  def sessionWindowAgg(spark: SparkSession, sfDir: String,
      gapMinutes: Int = 30): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("w"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("start_us"),
        unix_micros(col("w.end")).as("end_us"),
        col("n"), col("sum_value"))
      .orderBy("user_id", "start_us")

  /** Funnel / attribution join: for every purchase event, the same-user
    * view events in the preceding 30 minutes (count + first view id).
    * Equi-join on user_id carries the shuffle; the time bound is a
    * residual predicate — the batch twin of the watermarked stream-stream
    * join in [[graft.streaming.EventStream.funnelJoin]]. */
  def funnel(spark: SparkSession, sfDir: String, windowMinutes: Int = 30): DataFrame = {
    val winUs = windowMinutes * 60L * 1000000L
    val e = Tables.events(spark, sfDir)
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), unix_micros(col("ts")).as("v_us"),
        col("event_id").as("view_id"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), unix_micros(col("ts")).as("p_us"),
        col("event_id").as("purchase_id"))
    p.join(v, col("p_user") === col("v_user") &&
        col("v_us") <= col("p_us") && col("v_us") > col("p_us") - winUs, "left")
      .groupBy("purchase_id")
      .agg(count(col("view_id")).as("n_views"),
        coalesce(min("view_id"), lit(-1L)).as("first_view_id"))
      .orderBy("purchase_id")
  }

  /** [[cep]] match window (minutes) — shared with the oracle builder
    * so query and oracle cannot drift. */
  val CEP_WINDOW_MIN = 30

  /** Complex-event-processing match — the SQL:2016 MATCH_RECOGNIZE
    * `PATTERN (view notError* purchase)` shape: per user, each purchase
    * whose most recent preceding view is within [[windowMinutes]] AND
    * with no error between that view and the purchase. Spark has no row
    * pattern operator, so the match compiles to two running
    * conditional-max windows (latest view / latest error so far) over
    * ONE per-user sort: a purchase row matches iff its latest-view is
    * fresh enough and its latest-error is not newer than that view.
    *
    * Scale shape: a single shuffle keyed by user_id (the sessionization
    * posture) — no self-join, no per-pattern explode; window state is
    * two longs per row. Row order is (ts, event_id) so concurrent
    * events resolve deterministically in both engines. */
  def cep(spark: SparkSession, sfDir: String,
      windowMinutes: Int = CEP_WINDOW_MIN): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val winUs = windowMinutes * 60L * 1000000L
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("last_view_us",
        max(when(col("event_type") === "view", col("us"))).over(w))
      .withColumn("last_error_us",
        max(when(col("event_type") === "error", col("us"))).over(w))
      .filter(col("event_type") === "purchase"
        && col("last_view_us").isNotNull
        && col("us") - col("last_view_us") <= winUs
        && (col("last_error_us").isNull
            || col("last_error_us") <= col("last_view_us")))
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("last_view_us").as("view_us"),
        (col("us") - col("last_view_us")).as("gap_us"))
      .orderBy("user_id", "purchase_id")
  }

  /** DuckDB twin of [[cep]] — the identical two conditional-max windows
    * over the identical (ts, event_id) row order. */
  def cepOracle(windowMinutes: Int = CEP_WINDOW_MIN): String = {
    val winUs = windowMinutes * 60L * 1000000L
    s"""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
       |m AS (SELECT user_id, event_id, event_type, us,
       |        max(CASE WHEN event_type = 'view' THEN us END) OVER
       |          (PARTITION BY user_id ORDER BY us, event_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_us,
       |        max(CASE WHEN event_type = 'error' THEN us END) OVER
       |          (PARTITION BY user_id ORDER BY us, event_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_error_us
       |      FROM e)
       |SELECT user_id, event_id AS purchase_id, last_view_us AS view_us,
       |       CAST(us - last_view_us AS BIGINT) AS gap_us
       |FROM m
       |WHERE event_type = 'purchase' AND last_view_us IS NOT NULL
       |  AND us - last_view_us <= $winUs
       |  AND (last_error_us IS NULL OR last_error_us <= last_view_us)
       |ORDER BY user_id, purchase_id""".stripMargin
  }

  /** Semi-structured props extraction (regex — engine-portable, no JSON
    * extension dependency) + aggregation per event type. */
  def propsAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("long").as("k"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), count(lit(1)).as("n"))
      .orderBy("event_type")

  /** Cohort retention: users grouped by first-seen day, distinct actives
    * counted per (cohort, day offset) — the standard retention triangle.
    *
    * The cohort date comes from a min-over-user window, not a self-join:
    * one shuffle keyed by user_id computes first-seen AND tags every
    * event in the same pass (a groupBy+join formulation would shuffle
    * the events twice). The distinct count then reduces to the small
    * (cohort, offset, user) key space before the final aggregate. */
  def retention(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
    Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .withColumn("cohort", min("d").over(byUser))
      .groupBy(
        date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
        datediff(col("d"), col("cohort")).cast("long").as("day_offset"))
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort", "day_offset")
  }

  /** Daily-volume anomaly detection per event type: flag days whose
    * count deviates from the type's mean by more than 2 population
    * standard deviations. The test is evaluated in INTEGER arithmetic —
    * (n·c − S1)² > 4·(S2·c − S1²) with S1/S2 the count sums — so the
    * flagged set is exactly reproducible (no float variance accumulation
    * order to drift, FIXTURES.md §C). Two hash aggregates + a broadcast
    * of the per-type stats (one row per type); scales as a pure
    * aggregation pipeline. */
  def dailyAnomalies(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
    val stats = daily.groupBy("event_type")
      .agg(count(lit(1)).as("c"), sum("n").as("s1"), sum(col("n") * col("n")).as("s2"))
    val dev = col("n") * col("c") - col("s1")
    daily.join(broadcast(stats), "event_type")
      .filter(dev * dev > lit(4L) * (col("s2") * col("c") - col("s1") * col("s1")))
      .select(col("event_type"), col("day"), col("n"))
      .orderBy("event_type", "day")
  }

  /** First-touch / last-touch conversion attribution: for every
    * `purchase`, the earliest and the latest NON-purchase event the
    * same user emitted strictly before it (the classic marketing
    * attribution positions), credited to that event's type (the
    * "channel"); purchases with no prior touch credit `none`. Both
    * positions come from ONE pair of frame-bounded window functions
    * (first/last over [unbounded preceding, 1 preceding] IGNORE
    * NULLS — purchases in the frame are nulled out, never credited)
    * on the (ts, event_id)-ordered per-user timeline, so the whole
    * operator is a single user-keyed shuffle + sort — no
    * purchase×touch join, which would go quadratic per heavy user at
    * corpus scale. The final credit counts are channel-cardinality-
    * sized; their full-outer alignment is a cells-sized join.
    *
    * Determinism: event_id breaks same-microsecond ties in the
    * timeline order, so the credited channel is engine-identical. */
  def attribution(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type") =!= "purchase", col("event_type"))
    val conv = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("first_touch", first(touch, ignoreNulls = true).over(w))
      .withColumn("last_touch", last(touch, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
    val byFirst = conv
      .groupBy(coalesce(col("first_touch"), lit("none")).as("channel"))
      .agg(count(lit(1)).as("first_touch_conv"))
    val byLast = conv
      .groupBy(coalesce(col("last_touch"), lit("none")).as("channel"))
      .agg(count(lit(1)).as("last_touch_conv"))
    byFirst.join(byLast, Seq("channel"), "full_outer")
      .na.fill(0L, Seq("first_touch_conv", "last_touch_conv"))
      .orderBy("channel")
  }

  /** DuckDB twin of [[attribution]] — identical frame-bounded IGNORE
    * NULLS windows over the identical (ts, event_id) timeline order. */
  def attributionOracle: String =
    """WITH e AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
      |                     IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_touch,
      |         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
      |                    IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
      |  FROM events),
      |conv AS (SELECT coalesce(first_touch, 'none') AS fc,
      |                coalesce(last_touch, 'none') AS lc
      |         FROM e WHERE event_type = 'purchase'),
      |f AS (SELECT fc AS channel, count(*) AS first_touch_conv FROM conv GROUP BY 1),
      |l AS (SELECT lc AS channel, count(*) AS last_touch_conv FROM conv GROUP BY 1)
      |SELECT coalesce(f.channel, l.channel) AS channel,
      |       coalesce(first_touch_conv, 0) AS first_touch_conv,
      |       coalesce(last_touch_conv, 0) AS last_touch_conv
      |FROM f FULL OUTER JOIN l ON f.channel = l.channel
      |ORDER BY 1""".stripMargin
}
