"""Time-series operators over the events table (SURVEY.md §2.B
streaming rows, batch form) — tumbling windows, as-of join,
sessionization. The streaming variants live in burla_spark/streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from burla_spark.functions.numeric import money_sum
from burla_spark.operators.asof import asof_join
from burla_spark.plans.base import QuerySpec
from burla_spark.sources.tables import load_table


def events_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling-window aggregation via the native window()
    function (epoch-aligned buckets). Scale: single shuffle on
    (bucket, event_type); identical shape batch or streaming."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            money_sum("value", "total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n_events",
            "total_value",
            "n_users",
        )
    )


# DuckDB mirror: epoch-aligned 10-minute buckets. make_timestamp takes
# microseconds; epoch() yields (fractional) seconds treating the naive
# timestamp as UTC — the Spark session is pinned to UTC for the same
# semantics (session.py).
EVENTS_TUMBLING_SQL = """
SELECT
  make_timestamp(CAST(FLOOR(epoch(ts) / 600) * 600 * 1000000 AS BIGINT)) AS bucket_start,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
  COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, the most recent click (ts <= purchase ts) by
    the same user — implemented with the union+window as-of operator
    (see operators/asof.py), verified against DuckDB's native ASOF JOIN.

    NULL user ids are excluded on BOTH sides up front: SQL join
    semantics never match NULL keys (ASOF included), but the
    union+window formulation puts all NULL-key rows into ONE window
    partition and happily matches them to each other — the NULL-key
    sweep caught the divergence. An as-of match needs an identity."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    return asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="purchase_ts",
        right_ts="click_ts",
        right_cols=("click_id", "click_ts"),
    )


EVENTS_ASOF_SQL = """
SELECT
  p.purchase_id, p.user_id, p.purchase_ts, p.purchase_value,
  c.click_id, c.click_ts
FROM (
  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts, value AS purchase_value
  FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL
) p
ASOF LEFT JOIN (
  SELECT event_id AS click_id, user_id, ts AS click_ts
  FROM events WHERE event_type = 'click' AND user_id IS NOT NULL
) c ON p.user_id = c.user_id AND p.purchase_ts >= c.click_ts
"""


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (30-min inactivity gap): lag → new-session
    flag → cumulative sum = session id → per-session agg. One shuffle
    on user_id; all integer (microsecond) arithmetic so both engines
    agree bit-for-bit."""
    gap_us = 30 * 60 * 1_000_000
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros("ts")
    new_session = F.when(
        ts_us - F.lag(ts_us, 1).over(w) > gap_us, 1
    ).otherwise(F.when(F.lag(ts_us, 1).over(w).isNull(), 1).otherwise(0))
    sessions = e.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("session_seq"),
    )
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            money_sum("value", "session_value"),
        )
    )


EVENTS_SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT
    user_id, ts, event_id, value,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
           OR LAG(epoch_us(ts)) OVER w IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, event_id, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
)
SELECT
  user_id, CAST(session_seq AS BIGINT) AS session_seq,
  MIN(ts) AS session_start,
  MAX(ts) AS session_end,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS session_value
FROM sessions
GROUP BY user_id, session_seq
"""


def events_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute windows sliding every 10 minutes — each event lands in
    3 buckets (window() expands, then one shuffle to aggregate)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "30 minutes", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), money_sum("value", "total_value"))
        .select(F.col("w.start").alias("bucket_start"), "n_events", "total_value")
    )


# Mirror the slide expansion with generate_series: event at t belongs to
# buckets starting at floor((t - off)/600)*600 for off in {0,600,1200}
# intersected with window length 1800.
EVENTS_SLIDING_SQL = """
WITH expanded AS (
  SELECT
    make_timestamp(CAST((FLOOR(epoch(ts) / 600) - s.i) * 600 * 1000000 AS BIGINT)) AS bucket_start,
    value
  FROM events, (SELECT UNNEST(generate_series(0, 2)) AS i) s
)
SELECT bucket_start, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM expanded
GROUP BY bucket_start
"""


def events_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample to an hourly grid per event_type and fill the gaps:
    counts become 0, the gauge metric carries the last observation
    forward (LOCF).

    Scale shape: the dense grid is types × hours (tiny — it never
    depends on event volume), built with sequence()+explode and joined
    against the one-shuffle hourly aggregate; the LOCF window runs per
    type over the grid, not over raw events."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(
            F.col("event_type"),
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
        )
        .agg(F.count("*").alias("n"), money_sum("value", "v"))
    )
    grid = (
        e.select("event_type")
        .distinct()
        .crossJoin(
            spark.range(1).select(
                F.explode(
                    F.sequence(
                        F.lit("2024-01-01 00:00:00").cast("timestamp"),
                        F.lit("2024-01-30 23:00:00").cast("timestamp"),
                        F.expr("INTERVAL 1 HOUR"),
                    )
                ).alias("bucket")
            )
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            "bucket",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            F.last("v", ignorenulls=True).over(w).alias("locf_value"),
        )
        .orderBy("event_type", "bucket")
    )


EVENTS_RESAMPLE_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
  FROM events GROUP BY 1, 2
), grid AS (
  SELECT event_type, g.bucket
  FROM (SELECT DISTINCT event_type FROM events),
       (SELECT UNNEST(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                      TIMESTAMP '2024-01-30 23:00:00',
                                      INTERVAL 1 HOUR)) AS bucket) g
)
SELECT grid.event_type, grid.bucket,
       COALESCE(n, 0) AS n_events,
       LAST_VALUE(v IGNORE NULLS) OVER (
         PARTITION BY grid.event_type ORDER BY grid.bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
FROM grid
LEFT JOIN hourly ON grid.event_type = hourly.event_type AND grid.bucket = hourly.bucket
ORDER BY grid.event_type, grid.bucket
"""


# ---------------------------------------------------------------------------
# interval-overlap self-join, banded — which users were active within
# 15 minutes of each other (sessions padded ±15 min, overlapping pairs
# counted per user pair). The scale technique is the BANDING: each
# padded interval explodes into the hour buckets it spans, candidates
# come from an equi-join on (bucket) — bounded by sessions-per-hour² —
# and the exact overlap predicate filters inside the bucket. A naive
# theta join is corpus²; the DuckDB oracle can afford it at sf0.01
# (IEJoin), Spark never materializes it at any scale. All-integer
# microsecond arithmetic → bit-exact.
# ---------------------------------------------------------------------------
_PAD_US = 15 * 60 * 1_000_000
# 30-min bands: measured best at sf0.1 (60/30/15-min within 12% — the
# surviving-pair work dominates, so band width is not the lever here)
_BAND_US = 1_800_000_000


def interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOTE: no need to materialize sessions for the self-join — A/B
    # measured (sf0.1, 3 reps) spilling them first changes nothing;
    # the surviving-pair work inside the buckets dominates.
    s = events_sessionize(spark, sf_dir).select(
        "user_id",
        "session_seq",
        (F.unix_micros("session_start") - F.lit(_PAD_US)).alias("s_us"),
        (F.unix_micros("session_end") + F.lit(_PAD_US)).alias("e_us"),
    )
    banded = s.select(
        "user_id",
        "session_seq",
        "s_us",
        "e_us",
        F.explode(
            F.expr(f"sequence(s_us div {_BAND_US}, e_us div {_BAND_US})")
        ).alias("bucket"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    # Exactly-once WITHOUT a dedup shuffle: a pair spanning k shared
    # buckets is emitted only in the bucket containing the overlap's
    # START (greatest(s_a, s_b)). That bucket is always shared (the
    # overlap start lies inside both intervals), and no shared bucket
    # precedes it (the later-starting interval doesn't span earlier
    # buckets), so `overlap_start >= bucket*W` holds for exactly one
    # shared bucket. This replaces a distinct() over the full surviving
    # pair stream (9.8M rows at sf0.1 — measured 5.2 s → 3.0 s) with a
    # map-side-combinable count.
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.user_id") < F.col("b.user_id"))
        & (F.col("a.s_us") <= F.col("b.e_us"))
        & (F.col("b.s_us") <= F.col("a.e_us"))
        & (
            F.greatest(F.col("a.s_us"), F.col("b.s_us"))
            >= F.col("a.bucket") * _BAND_US
        ),
    )
    return (
        pairs.groupBy(
            F.col("a.user_id").alias("user_a"),
            F.col("b.user_id").alias("user_b"),
        )
        .agg(F.count("*").alias("n_overlaps"))
        .orderBy(F.col("n_overlaps").desc(), "user_a", "user_b")
        .limit(100)
    )


INTERVAL_OVERLAP_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
           OR LAG(epoch_us(ts)) OVER w IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
),
s AS (
  SELECT user_id, session_seq,
         MIN(epoch_us(ts)) - {_PAD_US} AS s_us,
         MAX(epoch_us(ts)) + {_PAD_US} AS e_us
  FROM numbered GROUP BY user_id, session_seq
)
SELECT a.user_id AS user_a, b.user_id AS user_b, COUNT(*) AS n_overlaps
FROM s a JOIN s b
  ON a.user_id < b.user_id AND a.s_us <= b.e_us AND b.s_us <= a.e_us
GROUP BY 1, 2
ORDER BY n_overlaps DESC, user_a, user_b
LIMIT 100
"""


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view → click → purchase): per user the
    first view, the first click strictly AFTER that view, the first
    purchase strictly after that click — then stage reach counts and
    the mean stage-transition time. The ordering constraint is what
    separates a funnel from three independent mins (a click before any
    view must not count), and exact integer-microsecond arithmetic
    (SUM DIV COUNT) keeps the means engine-exact.

    100 TB shape: ONE scan and ONE shuffle on user_id — the staged
    minima chain as stacked full-partition window aggregates over the
    same partitioning (Catalyst evaluates them in one sort-free window
    pass; an earlier 3-join formulation re-scanned events six times),
    then a user-cardinality aggregate collapses to the single result
    row."""
    e = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id")
    us = F.unix_micros("ts")
    staged = (
        e.select("user_id", "event_type", us.alias("us"))
        .withColumn(
            "t1",
            F.min(F.when(F.col("event_type") == "view", F.col("us"))).over(wu),
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("us") > F.col("t1")),
                    F.col("us"),
                )
            ).over(wu),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("us") > F.col("t2")),
                    F.col("us"),
                )
            ).over(wu),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.min("t1").alias("t1"), F.min("t2").alias("t2"), F.min("t3").alias("t3")
    )
    return per_user.agg(
        F.count("t1").alias("n_viewed"),
        F.count("t2").alias("n_clicked_after_view"),
        F.expr("sum(t2 - t1) div count(t2)").alias("avg_view_to_click_us"),
        F.count("t3").alias("n_purchased_after_click"),
        F.expr("sum(t3 - t2) div count(t3)").alias("avg_click_to_purchase_us"),
    )


FUNNEL_SQL = """
WITH base AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
), w1 AS (
  SELECT *, MIN(CASE WHEN event_type = 'view' THEN us END)
              OVER (PARTITION BY user_id) AS t1 FROM base
), w2 AS (
  SELECT *, MIN(CASE WHEN event_type = 'click' AND us > t1 THEN us END)
              OVER (PARTITION BY user_id) AS t2 FROM w1
), w3 AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND us > t2 THEN us END)
              OVER (PARTITION BY user_id) AS t3 FROM w2
), per_user AS (
  SELECT user_id, MIN(t1) AS t1, MIN(t2) AS t2, MIN(t3) AS t3
  FROM w3 GROUP BY user_id
)
SELECT CAST(COUNT(t1) AS BIGINT) AS n_viewed,
       CAST(COUNT(t2) AS BIGINT) AS n_clicked_after_view,
       CAST(SUM(t2 - t1) // COUNT(t2) AS BIGINT) AS avg_view_to_click_us,
       CAST(COUNT(t3) AS BIGINT) AS n_purchased_after_click,
       CAST(SUM(t3 - t2) // COUNT(t3) AS BIGINT) AS avg_click_to_purchase_us
FROM per_user
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention — the product-analytics staple: users
    grouped by first-activity week, counted in each later week they
    were active. Week arithmetic runs on epoch days (integer DIV), not
    engine week-truncation (Spark and DuckDB agree on Monday weeks,
    but integer day math can't drift on TZ/locale edges).

    100 TB shape: first-activity is one user-key aggregate; activity
    weeks are a distinct over (user, week); the join-back is on the
    user key again. The output is cohort² sized — tiny."""
    e = load_table(spark, sf_dir, "events")
    active = e.select(
        "user_id",
        F.expr("unix_micros(ts) div 86400000000 div 7").alias("week_idx"),
    ).distinct()
    cohort = active.groupBy("user_id").agg(F.min("week_idx").alias("cohort_week"))
    return (
        active.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week_idx") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


COHORT_SQL = """
WITH active AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 // 7 AS week_idx
  FROM events
), cohort AS (
  SELECT user_id, MIN(week_idx) AS cohort_week FROM active GROUP BY user_id
)
SELECT cohort.cohort_week,
       active.week_idx - cohort.cohort_week AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM active JOIN cohort USING (user_id)
GROUP BY 1, 2
ORDER BY cohort_week, week_offset
"""


def error_rate_spikes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monitoring-style spike detection: error counts per 10-minute
    bucket compared against the trailing 6-bucket mean (frame: 6
    preceding through 1 preceding — the current bucket must not smooth
    its own spike). A bucket flags when it exceeds twice the trailing
    mean. Counts are exact BIGINTs; the mean is SUM/COUNT over those
    integers, so both engines agree bit-for-bit.

    100 TB shape: the window frame runs over the BUCKETED aggregate
    (O(time-range) rows), never over raw events — one shuffle to
    bucket, one tiny single-partition window over the bucket series."""
    e = load_table(spark, sf_dir, "events")
    buckets = (
        e.filter(F.col("event_type") == "error")
        .groupBy(
            (F.expr("unix_micros(ts) div 600000000") * 600_000_000).alias(
                "bucket_us"
            )
        )
        .agg(F.count("*").alias("n_errors"))
    )
    w = (
        Window.orderBy("bucket_us").rowsBetween(-6, -1)
    )
    trailing = (
        F.sum("n_errors").over(w).cast("double")
        / F.count("n_errors").over(w).cast("double")
    )
    return (
        buckets.select(
            "bucket_us",
            "n_errors",
            F.round(trailing, 6).alias("trailing_mean"),
            F.when(
                F.col("n_errors").cast("double") > 2 * trailing, 1
            ).otherwise(0).cast("long").alias("is_spike"),
        )
        .orderBy("bucket_us")
    )


ERROR_SPIKES_SQL = """
WITH buckets AS (
  SELECT (epoch_us(ts) // 600000000) * 600000000 AS bucket_us,
         CAST(COUNT(*) AS BIGINT) AS n_errors
  FROM events WHERE event_type = 'error'
  GROUP BY 1
)
SELECT bucket_us, n_errors,
  ROUND(CAST(SUM(n_errors) OVER w AS DOUBLE)
        / CAST(COUNT(n_errors) OVER w AS DOUBLE), 6) AS trailing_mean,
  CAST(CASE WHEN CAST(n_errors AS DOUBLE) >
        2 * (CAST(SUM(n_errors) OVER w AS DOUBLE)
             / CAST(COUNT(n_errors) OVER w AS DOUBLE))
       THEN 1 ELSE 0 END AS BIGINT) AS is_spike
FROM buckets
WINDOW w AS (ORDER BY bucket_us ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)
ORDER BY bucket_us
"""


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral transition matrix: for each user's
    time-ordered event stream, count (prev_type → next_type) pairs and
    the conditional probability p(next | prev) — the Markov-chain view
    of user behavior that personalization and anomaly models start
    from. Ordering ties break on event_id, so the lag sequence is a
    total order on both engines; probabilities divide exact BIGINTs.

    100 TB shape: ONE shuffle on user_id for the lag window, then a
    type²-cardinality aggregate (tiny); the probability join-back is
    on prev_type (broadcast)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(
            F.lag("event_type", 1).over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").alias("n_transitions"))
    )
    totals = pairs.groupBy("prev_type").agg(
        F.sum("n_transitions").alias("n_from")
    )
    return (
        pairs.join(F.broadcast(totals), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n_transitions",
            F.round(
                F.col("n_transitions").cast("double")
                / F.col("n_from").cast("double"),
                6,
            ).alias("p_next_given_prev"),
        )
        .orderBy("prev_type", "next_type")
    )


EVENT_TRANSITION_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
), pairs AS (
  SELECT prev_type, event_type AS next_type,
         CAST(COUNT(*) AS BIGINT) AS n_transitions
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
), totals AS (
  SELECT prev_type, SUM(n_transitions) AS n_from FROM pairs GROUP BY 1
)
SELECT p.prev_type, p.next_type, p.n_transitions,
       ROUND(CAST(p.n_transitions AS DOUBLE) / CAST(t.n_from AS DOUBLE), 6)
         AS p_next_given_prev
FROM pairs p JOIN totals t USING (prev_type)
ORDER BY p.prev_type, p.next_type
"""


def sequence_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-sequence pattern matching (MATCH_RECOGNIZE /
    ClickHouse sequenceMatch territory, composed from lead chains):
    occurrences of the exact view→click→purchase pattern in each
    user's time-ordered stream with NO intervening events — stricter
    than the funnel, which allows gaps. Ties in the ordering break on
    event_id so the lead sequence is a total order on both engines.

    100 TB shape: one shuffle on user_id for the window, map-side lead
    evaluation, then a user-cardinality aggregate. A k-step pattern is
    k-1 leads — no self-joins, no explosion."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hit = (
        (F.col("event_type") == "view")
        & (F.lead("event_type", 1).over(w) == "click")
        & (F.lead("event_type", 2).over(w) == "purchase")
    )
    return (
        e.select(
            "user_id",
            "event_id",
            hit.cast("long").alias("is_match"),
        )
        .groupBy("user_id")
        .agg(
            F.sum("is_match").alias("n_matches"),
            F.min(F.when(F.col("is_match") == 1, F.col("event_id"))).alias(
                "first_match_event"
            ),
        )
        .filter(F.col("n_matches") > 0)
        .orderBy("user_id")
    )


SEQUENCE_PATTERN_SQL = """
WITH seq AS (
  SELECT user_id, event_id,
    CASE WHEN event_type = 'view'
          AND LEAD(event_type, 1) OVER w = 'click'
          AND LEAD(event_type, 2) OVER w = 'purchase'
         THEN 1 ELSE 0 END AS is_match
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       CAST(SUM(is_match) AS BIGINT) AS n_matches,
       MIN(CASE WHEN is_match = 1 THEN event_id END) AS first_match_event
FROM seq GROUP BY user_id HAVING SUM(is_match) > 0
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# EWMA smoothing — the exponential-decay signal every monitoring /
# feature pipeline wants. Free-running EWMA is a sequential recurrence
# (accumulation-order dependent → engine-divergent in floats); the
# K-term truncated form with dyadic alpha=1/2 makes every weight a
# power of two and the whole numerator/denominator EXACT BIGINT
# arithmetic: ewma_i = Σ_{j<K} 2^(K-1-j)·v_{i-j} / Σ 2^(K-1-j), with
# absent lags dropping out of both sums. Truncation error of the
# untruncated EWMA is ≤ 2^-K of the signal range — at K=8 that is the
# 0.4 % tail, which monitoring use cases don't see.
# ---------------------------------------------------------------------------
_EWMA_K = 8
_V_SCALE = 1_000_000  # value fixed-point: 6 decimal digits


def ewma_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest truncated-EWMA of ``value`` per user (alpha=1/2, 8 terms).

    100 TB shape: ONE shuffle on user_id; the 8 lag() columns evaluate
    in a single window sort pass (same frame, same ordering), and the
    final latest-row filter is a row_number over the same partitioning
    — Catalyst fuses it into the same sort, so no second exchange."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = e.select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * _V_SCALE).cast("long").alias("v_fp"),
    )
    lags = [
        F.lag("v_fp", j).over(w).alias(f"l{j}") for j in range(1, _EWMA_K)
    ]
    # latest row = ascending row_number == partition count, so the lag
    # chain, the row_number, and the count all share ONE ascending sort
    # (a desc row_number would force a second intra-partition sort)
    lagd = base.select(
        "user_id",
        F.col("v_fp").alias("l0"),
        *lags,
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("user_id")).alias("n_events"),
    )
    num = None
    den = None
    for j in range(_EWMA_K):
        wgt = 1 << (_EWMA_K - 1 - j)
        term = F.coalesce(F.col(f"l{j}") * wgt, F.lit(0))
        mask = F.when(F.col(f"l{j}").isNotNull(), F.lit(wgt)).otherwise(F.lit(0))
        num = term if num is None else num + term
        den = mask if den is None else den + mask
    return (
        lagd.filter(F.col("rn") == F.col("n_events"))
        .select(
            "user_id",
            F.col("n_events").cast("long").alias("n_events"),
            (
                F.when(
                    den > 0,
                    F.round(
                        num.cast("double") / den.cast("double") / _V_SCALE, 6
                    )
                    + F.lit(0.0),
                )
            ).alias("ewma_value"),
        )
        .orderBy("user_id")
    )


def _ewma_sql() -> str:
    k, scale = _EWMA_K, _V_SCALE
    lag_cols = ",\n    ".join(
        f"LAG(v_fp, {j}) OVER w AS l{j}" for j in range(1, k)
    )
    num = " + ".join(f"COALESCE(l{j} * {1 << (k - 1 - j)}, 0)" for j in range(k))
    den = " + ".join(
        f"CASE WHEN l{j} IS NOT NULL THEN {1 << (k - 1 - j)} ELSE 0 END"
        for j in range(k)
    )
    return f"""
WITH base AS (
  SELECT user_id, ts, event_id,
         CAST(ROUND(value * {scale}) AS BIGINT) AS v_fp
  FROM events
), lagd AS (
  -- latest row = ASCENDING rn == partition count, mirroring the Spark
  -- plan EXACTLY. A DESC rn = 1 here picked a DIFFERENT member of a
  -- tied pair when the last row arrives duplicated (replayed ingest):
  -- the two copies are identical but their lag chains are NOT (the
  -- ascending-last copy sees its twin at lag 1; the other does not),
  -- so the selection rule is part of the semantics, not presentation
  -- (caught by the round-7 dup sweep).
  SELECT user_id, v_fp AS l0,
    {lag_cols},
    ROW_NUMBER() OVER w AS rn,
    COUNT(*) OVER (PARTITION BY user_id) AS n_events
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
  CASE WHEN ({den}) > 0 THEN
    ROUND(CAST(({num}) AS DOUBLE) / CAST(({den}) AS DOUBLE) / {scale}, 6) + 0.0
  END AS ewma_value
FROM lagd WHERE rn = n_events ORDER BY user_id
"""


EWMA_SQL = _ewma_sql()


# ---------------------------------------------------------------------------
# Sequential pattern MINING: frequent contiguous event 3-grams
# ---------------------------------------------------------------------------
SEQ_N = 3
SEQ_TOP = 20


def frequent_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discover the corpus's frequent behavior motifs: every contiguous
    {SEQ_N}-event-type sequence in each user's time-ordered stream,
    counted globally, top-{SEQ_TOP} by support — the mining complement
    of sequence_pattern_match (which counts a GIVEN pattern). Support
    is per occurrence; n_users is the distinct-user support the
    classical algorithms threshold on.

    100 TB shape: one shuffle on user_id, two map-side leads per row
    (a k-gram is k-1 leads — no self-join), then a
    sequence-cardinality aggregate; the top-k has the rule-5 unique
    order (support DESC, sequence ASC)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # F.concat (NULL-propagating, matching SQL ||), NOT concat_ws: a
    # NULL event_type inside the stream must BREAK contiguity, not be
    # skipped — concat_ws would fabricate an 'a>c' pseudo-sequence
    # joining non-adjacent events (and diverge from the oracle). The
    # IS NOT NULL filter covers both interior NULLs and the partition
    # tail where the leads run out.
    seq = F.concat(
        F.col("event_type"),
        F.lit(">"),
        F.lead("event_type", 1).over(w),
        F.lit(">"),
        F.lead("event_type", 2).over(w),
    )
    return (
        e.select("user_id", seq.alias("seq"))
        .filter(F.col("seq").isNotNull())
        .groupBy("seq")
        .agg(
            F.count("*").alias("support"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("support"), F.asc("seq"))
        .limit(SEQ_TOP)
    )


FREQUENT_SEQ_SQL = f"""
WITH lagd AS (
  SELECT user_id,
         event_type || '>' || LEAD(event_type, 1) OVER w
           || '>' || LEAD(event_type, 2) OVER w AS seq
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT seq, CAST(COUNT(*) AS BIGINT) AS support,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM lagd WHERE seq IS NOT NULL
GROUP BY seq ORDER BY support DESC, seq LIMIT {SEQ_TOP}
"""


# ---------------------------------------------------------------------------
# Seasonal decomposition: hour-of-day profile against a centered MA trend
# ---------------------------------------------------------------------------
SEASONAL_HALF = 12  # ±12h -> 25-hour centered trend window


def seasonal_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical-decomposition seasonal profile: the trend at each hour
    is the observation-weighted mean of ALL raw values in the ±12-hour
    TIME window (a RANGE frame on the hour index, so gaps in sparse
    hours widen nothing); the seasonal component per (event_type,
    hour-of-day) is the mean deviation of the hourly mean from that
    trend, over hours whose trend window is fully interior. This is
    the anomaly-detection baseline ("is tonight's error rate high FOR
    3AM?") that raw thresholds can't express.

    Determinism: trend = exact-DECIMAL window sum / BIGINT window
    count (one double division); deviations are ROUNDED to 6 dp BEFORE
    re-entering DECIMAL for the per-hod mean — casting a raw computed
    double into DECIMAL quantizes at .5-of-last-digit boundaries where
    the engines' double->decimal rounding can disagree (measured: a
    DECIMAL(18,4) cast flipped the 4th decimal of one deviation),
    while a 6-dp-rounded double sits ~1 ulp from its decimal lattice
    point, so the cast is unambiguous in both engines. Output rounds
    + normalizes signed zero (deviations cross 0 by construction).

    100 TB shape: one shuffle to hourly grain (corpus-sized input,
    types×hours output), then every window partitions by event_type
    over the HOURLY table — bounded by the calendar, not the event
    volume. The interior gate is per-type window MIN/MAX sharing the
    trend window's exchange — a join against a separately aggregated
    bounds table re-scanned the corpus (Catalyst duplicates unshared
    lineage), which at 100 TB is a second full scan for 2 numbers."""
    from burla_spark.functions.numeric import dec

    e = load_table(spark, sf_dir, "events")
    hour_idx = F.expr(
        "CAST(unix_timestamp(date_trunc('hour', ts)) / 3600 AS BIGINT)"
    )
    hourly = (
        e.groupBy(F.col("event_type"), hour_idx.alias("h"))
        .agg(F.sum(dec("value")).alias("vsum"), F.count("*").alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rangeBetween(-SEASONAL_HALF, SEASONAL_HALF)
    )
    w_type = Window.partitionBy("event_type")
    trended = hourly.select(
        "event_type",
        "h",
        (F.col("vsum").cast("double") / F.col("n")).alias("hmean"),
        (F.sum("vsum").over(w).cast("double") / F.sum("n").over(w)).alias("trend"),
        F.min("h").over(w_type).alias("h_min"),
        F.max("h").over(w_type).alias("h_max"),
    )
    interior = trended.filter(
        (F.col("h") >= F.col("h_min") + SEASONAL_HALF)
        & (F.col("h") <= F.col("h_max") - SEASONAL_HALF)
    ).select(
        "event_type",
        (F.col("h") % 24).alias("hod"),
        F.round(F.col("hmean") - F.col("trend"), 6)
        .cast("decimal(28,6)")
        .alias("dev"),
    )
    return (
        interior.groupBy("event_type", "hod")
        .agg(
            F.count("*").alias("n_hours"),
            (
                F.round(F.sum("dev").cast("double") / F.count("*"), 6) + F.lit(0.0)
            ).alias("seasonal"),
        )
        .orderBy("event_type", "hod")
    )


SEASONAL_PROFILE_SQL = f"""
WITH hourly AS (
  SELECT event_type,
         CAST(epoch(date_trunc('hour', ts)) / 3600 AS BIGINT) AS h,
         SUM(CAST(value AS DECIMAL(18,4))) AS vsum, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
trended AS (
  SELECT event_type, h,
         CAST(vsum AS DOUBLE) / n AS hmean,
         CAST(SUM(vsum) OVER tw AS DOUBLE) / SUM(n) OVER tw AS trend,
         MIN(h) OVER (PARTITION BY event_type) AS h_min,
         MAX(h) OVER (PARTITION BY event_type) AS h_max
  FROM hourly
  WINDOW tw AS (PARTITION BY event_type ORDER BY h
                RANGE BETWEEN {SEASONAL_HALF} PRECEDING
                          AND {SEASONAL_HALF} FOLLOWING)
),
interior AS (
  SELECT event_type, h % 24 AS hod,
         CAST(ROUND(hmean - trend, 6) AS DECIMAL(28,6)) AS dev
  FROM trended
  WHERE h >= h_min + {SEASONAL_HALF} AND h <= h_max - {SEASONAL_HALF}
)
SELECT event_type, hod, CAST(COUNT(*) AS BIGINT) AS n_hours,
       ROUND(CAST(SUM(dev) AS DOUBLE) / COUNT(*), 6) + 0.0 AS seasonal
FROM interior GROUP BY 1, 2 ORDER BY event_type, hod
"""


# ---------------------------------------------------------------------------
# CUSUM changepoint detection (round 14): offline single-changepoint
# localization per event_type — the first split of binary segmentation
# (Page's CUSUM read at the argmax, a.k.a. Taylor's changepoint
# estimator). The statistic C_i = Σ_{j≤i}(x_j − x̄) is kept EXACT by
# clearing both denominators: D_i = n·prefix_i − i·total is pure
# BIGINT on cent-scaled values, so Spark and DuckDB agree bit-for-bit
# and the argmax row (the changepoint) is uniquely determined, with
# (−|D|, i) ordering breaking ties toward the earliest boundary.
#
# 100 TB shape: ONE shuffle on event_type — the running prefix sum and
# the per-key totals share the same window partitioning, and the
# argmax is a map-side-combinable max(struct(...)) aggregate, not a
# second sort. BIGINT headroom: |D| ≤ n²·max|x|·scale, safe beyond
# 1e7 rows per key at cent scale; past that, segment the series
# (per-day keys) or route D through decimal(38,0) exactly as money_sum
# does — changepoint scans at 100 TB are run per segment anyway.
# ---------------------------------------------------------------------------
_CUSUM_SCALE = 100  # cents: event values carry 2 decimals


def cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wk = Window.partitionBy("event_type")
    base = e.select(
        "event_type",
        "ts",
        "event_id",
        F.round(F.col("value") * _CUSUM_SCALE).cast("long").alias("v_fp"),
    )
    scanned = base.select(
        "event_type",
        "ts",
        F.row_number().over(w).alias("i"),
        F.sum("v_fp").over(w).alias("prefix"),
        F.count("*").over(wk).alias("n"),
        F.sum("v_fp").over(wk).alias("total"),
    )
    d = scanned.withColumn(
        "dstat", F.col("n") * F.col("prefix") - F.col("i") * F.col("total")
    )
    # argmax |D| (earliest i on ties) as ONE map-side-combinable
    # aggregate: max over struct(|D|, -i, payload...) — no second sort
    best = d.groupBy("event_type").agg(
        F.max(
            F.struct(
                F.abs(F.col("dstat")).alias("absd"),
                (-F.col("i")).alias("neg_i"),
                F.col("i").alias("i"),
                F.col("ts").alias("ts"),
                F.col("prefix").alias("prefix"),
                F.col("n").alias("n"),
                F.col("total").alias("total"),
            )
        ).alias("b")
    )
    return best.select(
        "event_type",
        F.col("b.i").cast("long").alias("cp_index"),
        F.col("b.ts").alias("cp_ts"),
        F.col("b.n").cast("long").alias("n_events"),
        # |C_i| = |D_i|/n, back in original units
        (
            F.round(
                F.col("b.absd").cast("double")
                / F.col("b.n")
                / _CUSUM_SCALE,
                6,
            )
            + F.lit(0.0)
        ).alias("cusum_stat"),
        (
            F.round(
                F.col("b.prefix").cast("double")
                / F.col("b.i")
                / _CUSUM_SCALE,
                6,
            )
            + F.lit(0.0)
        ).alias("mean_before"),
        F.when(
            F.col("b.n") > F.col("b.i"),
            F.round(
                (F.col("b.total") - F.col("b.prefix")).cast("double")
                / (F.col("b.n") - F.col("b.i"))
                / _CUSUM_SCALE,
                6,
            )
            + F.lit(0.0),
        ).alias("mean_after"),
    ).orderBy("event_type")


CUSUM_SQL = f"""
WITH base AS (
  SELECT event_type, ts, event_id,
         CAST(ROUND(value * {_CUSUM_SCALE}) AS BIGINT) AS v_fp
  FROM events
), scanned AS (
  SELECT event_type, ts,
         ROW_NUMBER() OVER w AS i,
         SUM(v_fp) OVER w AS prefix,
         COUNT(*) OVER wk AS n,
         SUM(v_fp) OVER wk AS total
  FROM base
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id),
         wk AS (PARTITION BY event_type)
), d AS (
  SELECT event_type, ts, i, prefix, n, total,
         n * prefix - i * total AS dstat
  FROM scanned
), ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (
           PARTITION BY event_type ORDER BY ABS(dstat) DESC, i ASC
         ) AS rk
  FROM d
)
SELECT event_type,
       CAST(i AS BIGINT) AS cp_index,
       ts AS cp_ts,
       CAST(n AS BIGINT) AS n_events,
       ROUND(CAST(ABS(dstat) AS DOUBLE) / n / {_CUSUM_SCALE}, 6)
         + 0.0 AS cusum_stat,
       ROUND(CAST(prefix AS DOUBLE) / i / {_CUSUM_SCALE}, 6)
         + 0.0 AS mean_before,
       CASE WHEN n > i THEN
         ROUND(CAST(total - prefix AS DOUBLE) / (n - i) / {_CUSUM_SCALE}, 6)
           + 0.0
       END AS mean_after
FROM ranked WHERE rk = 1 ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Multi-touch attribution (round 14): the conversion-credit view a
# marketing/analytics stack runs — for every purchase, find the FIRST
# and LAST touch event (view/click/signup) of the same user inside a
# 6-hour lookback, and credit the purchase (count + value) to that
# touch type under both models; purchases with no in-window touch
# roll up as 'direct'. Complements funnel_conversion (fixed ordered
# stages) with the window-scoped credit-assignment semantics.
#
# Exactness: the touch identity is packed into ONE BIGINT —
# ts_µs·4096 + event_id % 4096 — so MIN/MAX over the range frame is
# pure integer arithmetic on both engines (headroom: 2024-era µs
# ≈ 1.7e15, ×4096 ≈ 7e18 < int64 max; the residual event_id%4096
# collision needs two distinct same-user touches in the same
# MICROsecond with ids 4096 apart — and exact duplicate rows, the
# replayed-ingest shape, encode identically by construction). Credited
# value is cent fixed-point.
#
# 100 TB shape: ONE user-keyed window pass (both MIN and MAX share the
# frame), a map-side explode to the two models, and one
# (user, touch_key)-keyed decode join whose right side is the distinct
# touch set — no per-purchase scan of history, no self-join over the
# events table. Output bounded by models × touch-type domain.
# ---------------------------------------------------------------------------
_ATTR_LOOKBACK_US = 6 * 3600 * 1_000_000  # 6-hour attribution window
_ATTR_TOUCHES = ("click", "signup", "view")


def multi_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.col("value") * 100).cast("long").alias("v_fp"),
        F.when(
            F.col("event_type").isin(*_ATTR_TOUCHES),
            F.unix_micros("ts") * 4096 + F.col("event_id") % 4096,
        ).alias("touch_key"),
    )
    wr = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-_ATTR_LOOKBACK_US, -1)
    )
    scanned = base.select(
        "user_id",
        "event_type",
        "v_fp",
        F.min("touch_key").over(wr).alias("first_key"),
        F.max("touch_key").over(wr).alias("last_key"),
    )
    conv = (
        scanned.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "v_fp",
            F.explode(
                F.array(
                    F.struct(
                        F.lit("first_touch").alias("model"),
                        F.col("first_key").alias("key"),
                    ),
                    F.struct(
                        F.lit("last_touch").alias("model"),
                        F.col("last_key").alias("key"),
                    ),
                )
            ).alias("m"),
        )
        .select("user_id", "v_fp", "m.model", "m.key")
    )
    touches = base.filter(F.col("touch_key").isNotNull()).select(
        "user_id",
        F.col("touch_key").alias("key"),
        F.col("event_type").alias("touch_type"),
    ).distinct()
    return (
        conv.join(touches, ["user_id", "key"], "left")
        .groupBy("model", F.coalesce("touch_type", F.lit("direct")).alias("touch_type"))
        .agg(
            F.count("*").cast("long").alias("n_conversions"),
            (
                F.round(F.sum("v_fp").cast("double") / 100, 6) + F.lit(0.0)
            ).alias("credited_value"),
        )
        .orderBy("model", "touch_type")
    )


_ATTR_TOUCH_LIST = ", ".join(f"'{t}'" for t in _ATTR_TOUCHES)
ATTRIBUTION_SQL = f"""
WITH base AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us,
         CAST(ROUND(value * 100) AS BIGINT) AS v_fp,
         CASE WHEN event_type IN ({_ATTR_TOUCH_LIST})
              THEN epoch_us(ts) * 4096 + event_id % 4096 END AS touch_key
  FROM events
), scanned AS (
  SELECT user_id, event_type, v_fp,
         MIN(touch_key) OVER w AS first_key,
         MAX(touch_key) OVER w AS last_key
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
               RANGE BETWEEN {_ATTR_LOOKBACK_US} PRECEDING
                         AND 1 PRECEDING)
), conv AS (
  SELECT user_id, v_fp, 'first_touch' AS model, first_key AS key
  FROM scanned WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, v_fp, 'last_touch' AS model, last_key AS key
  FROM scanned WHERE event_type = 'purchase'
), touches AS (
  SELECT DISTINCT user_id, touch_key AS key, event_type AS touch_type
  FROM base WHERE touch_key IS NOT NULL
)
SELECT conv.model, COALESCE(t.touch_type, 'direct') AS touch_type,
       CAST(COUNT(*) AS BIGINT) AS n_conversions,
       ROUND(CAST(SUM(conv.v_fp) AS DOUBLE) / 100, 6) + 0.0
         AS credited_value
FROM conv LEFT JOIN touches t
  ON t.user_id = conv.user_id AND t.key = conv.key
GROUP BY 1, 2
ORDER BY 1, 2
"""


SPECS: list[QuerySpec] = [
    QuerySpec(
        "multi_touch_attribution",
        multi_touch_attribution,
        ATTRIBUTION_SQL,
        ("timeseries", "analytics", "window"),
        doc="First/last-touch conversion credit inside a 6h lookback — "
        "integer-packed touch identity, one window pass + decode join "
        "(round 14).",
    ),
    QuerySpec(
        "cusum_changepoints",
        cusum_changepoints,
        CUSUM_SQL,
        ("timeseries", "window", "mining", "monitoring"),
        doc="Exact-integer CUSUM argmax changepoint per event_type "
        "(binary-segmentation first split), one shuffle + struct-max "
        "aggregate (round 14).",
    ),
    QuerySpec(
        "frequent_event_sequences",
        frequent_event_sequences,
        FREQUENT_SEQ_SQL,
        ("timeseries", "window", "mining"),
        doc="Top-20 contiguous event 3-grams by support (pattern mining).",
    ),
    QuerySpec(
        "seasonal_hourly_profile",
        seasonal_hourly_profile,
        SEASONAL_PROFILE_SQL,
        ("timeseries", "window", "monitoring"),
        doc="Hour-of-day seasonal profile vs ±12h range-frame trend.",
    ),
    QuerySpec(
        "ewma_event_values",
        ewma_event_values,
        EWMA_SQL,
        ("timeseries", "window", "monitoring"),
        doc="Truncated dyadic-weight EWMA per user, exact BIGINT accumulation.",
    ),
    QuerySpec(
        "interval_overlap_join",
        interval_overlap_join,
        INTERVAL_OVERLAP_SQL,
        ("join", "timeseries"),
        doc="Banded interval-overlap self-join (co-activity pairs).",
    ),
    QuerySpec("events_tumbling_agg", events_tumbling_agg, EVENTS_TUMBLING_SQL, ("window", "timeseries")),
    QuerySpec("events_sliding_agg", events_sliding_agg, EVENTS_SLIDING_SQL, ("window", "timeseries")),
    QuerySpec("events_asof_join", events_asof_join, EVENTS_ASOF_SQL, ("join", "timeseries")),
    QuerySpec("events_sessionize", events_sessionize, EVENTS_SESSIONIZE_SQL, ("window", "timeseries")),
    QuerySpec(
        "events_resample_gapfill",
        events_resample_gapfill,
        EVENTS_RESAMPLE_SQL,
        ("window", "timeseries"),
        doc="Hourly resample + gap-fill (0-fill counts, LOCF gauge).",
    ),
    QuerySpec(
        "funnel_conversion",
        funnel_conversion,
        FUNNEL_SQL,
        ("timeseries", "analytics"),
        doc="Ordered view->click->purchase funnel with exact stage timings.",
    ),
    QuerySpec(
        "cohort_retention",
        cohort_retention,
        COHORT_SQL,
        ("timeseries", "analytics"),
        doc="Weekly cohort retention on integer epoch-day arithmetic.",
    ),
    QuerySpec(
        "error_rate_spikes",
        error_rate_spikes,
        ERROR_SPIKES_SQL,
        ("timeseries", "window", "monitoring"),
        doc="Error-count spikes vs a trailing 6-bucket window frame.",
    ),
    QuerySpec(
        "sequence_pattern_match",
        sequence_pattern_match,
        SEQUENCE_PATTERN_SQL,
        ("timeseries", "analytics", "window"),
        doc="Consecutive view->click->purchase pattern occurrences per user.",
    ),
    QuerySpec(
        "event_transition_matrix",
        event_transition_matrix,
        EVENT_TRANSITION_SQL,
        ("timeseries", "analytics", "window"),
        doc="Markov (prev,next) event-type transition counts + p(next|prev).",
    ),
]
