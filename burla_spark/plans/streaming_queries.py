"""Streaming QuerySpecs — each callable executes a REAL Structured
Streaming query (file source, AvailableNow trigger, memory sink) and
returns the materialized result; the oracle is the batch-SQL
equivalent, so the driver's hash compare proves stream/batch parity.
"""

from __future__ import annotations

from burla_spark.plans.base import QuerySpec
from burla_spark.streaming.events import (
    stream_burst_throttle,
    stream_click_purchase_join,
    stream_full_outer_join,
    stream_left_outer_join,
    stream_timer_sessions,
    stream_upsert_user_totals,
    stream_sliding_counts,
    stream_watermark_dedup,
    stream_key_dedup,
    stream_session_aggregate,
    stream_stateful_user_stats,
    stream_static_enrich,
    stream_tumbling_counts,
)

STREAM_STATIC_ENRICH_SQL = """
SELECT c.c_mktsegment,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
"""

STREAM_TUMBLING_SQL = """
SELECT
  make_timestamp(CAST(FLOOR(epoch(ts) / 600) * 600 * 1000000 AS BIGINT)) AS bucket_start,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""

# session_window(gap): sessions merge while consecutive events are
# < gap apart; start = first ts. Mirrors the batch lag/cumsum recipe.
STREAM_SESSION_SQL = """
WITH flagged AS (
  SELECT user_id, ts, value,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
           OR LAG(epoch_us(ts)) OVER w IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
)
SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS session_value
FROM sessions GROUP BY user_id, session_seq
"""

STREAM_KEY_DEDUP_SQL = "SELECT DISTINCT user_id, event_type FROM events"

# the batch window-lag burst filter is an exact oracle: the stream
# carries the last SEEN ts per key in state, which is precisely LAG
STREAM_BURST_THROTTLE_SQL = """
WITH lagged AS (
  SELECT event_id, user_id, event_type, ts,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id) AS prev_us
  FROM events WHERE ts IS NOT NULL
)
SELECT event_id, user_id, event_type, ts
FROM lagged
WHERE prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
"""

# fsum (correctly-rounded) state total rounded to 2 decimals equals the
# decimal-routed batch sum (inputs are 2-decimal values; divergence
# bounded by n·ulp ≪ rounding grid).
STREAM_STATEFUL_SQL = """
SELECT user_id, COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
FROM events GROUP BY user_id
"""

# inner interval join + availableNow emits exactly the matched pairs,
# so the batch self-join is an exact oracle (no watermark truncation
# for inner joins — the watermark only bounds state).
STREAM_CLICK_PURCHASE_SQL = """
SELECT c.user_id,
       c.event_id AS click_id,
       p.event_id AS purchase_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS micros_to_purchase,
       p.value AS purchase_value
FROM events c
JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
"""

# NULL-key policy (both sides; see run_upsert_totals): upsert merge
# keys need an identity — NULL user_id is excluded in stream and oracle.
STREAM_UPSERT_SQL = """
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events WHERE user_id IS NOT NULL GROUP BY user_id
"""

# NULL-key policy (both sides; see stream_timer_sessions): session keys
# need an identity — NULL user_id is excluded in stream and oracle.
STREAM_TIMER_SESSIONS_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
           OR LAG(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events WHERE user_id IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts, value,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS session_value
FROM sessions GROUP BY user_id, seq
"""

STREAM_LEFT_OUTER_SQL = """
SELECT c.user_id,
       c.event_id AS click_id,
       p.event_id AS purchase_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS micros_to_purchase,
       p.value AS purchase_value
FROM events c
LEFT JOIN events p
  ON c.user_id = p.user_id
 AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
WHERE c.event_type = 'click'
"""

# NULL-key policy (both sides; see stream_full_outer_join): join keys
# need an identity — NULL user_id is excluded in stream and oracle.
STREAM_FULL_OUTER_SQL = """
SELECT COALESCE(c.user_id, p.user_id) AS user_id,
       c.event_id AS click_id,
       p.event_id AS purchase_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS micros_to_purchase,
       p.value AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click' AND user_id IS NOT NULL) c
FULL JOIN (SELECT * FROM events
           WHERE event_type = 'purchase' AND user_id IS NOT NULL) p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
"""

STREAM_SLIDING_SQL = """
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

# event_id is unique and the 31-day horizon covers the whole replay, so
# the watermarked dedup equals batch DISTINCT exactly.
# DISTINCT, not a bare projection: with unique fixture event_ids the
# two are identical, but a replayed/dup-injected feed must still match
# the stream's dedup semantics (duplicates are bit-identical rows, so
# row-DISTINCT ≡ dedup-by-event_id).
STREAM_WM_DEDUP_SQL = "SELECT DISTINCT event_id, user_id, event_type FROM events"

SPECS: list[QuerySpec] = [
    QuerySpec("stream_tumbling_counts", stream_tumbling_counts, STREAM_TUMBLING_SQL, ("streaming",)),
    QuerySpec(
        "stream_click_purchase_join",
        stream_click_purchase_join,
        STREAM_CLICK_PURCHASE_SQL,
        ("streaming", "join"),
        doc="Stream-stream interval join with two-sided watermarks.",
    ),
    QuerySpec(
        "stream_timer_sessions",
        stream_timer_sessions,
        STREAM_TIMER_SESSIONS_SQL,
        ("streaming", "state", "timer"),
        doc="EventTimeTimeout timer-driven sessionization in arbitrary "
        "state; watermark-fired emission equals batch sessionize exactly "
        "(sentinel replay flushes the tail).",
    ),
    QuerySpec(
        "stream_left_outer_join",
        stream_left_outer_join,
        STREAM_LEFT_OUTER_SQL,
        ("streaming", "join"),
        doc="LEFT OUTER stream-stream join: watermark-flushed unmatched "
        "clicks equal the batch left join (sentinel replay mechanics in "
        "streaming/events.py).",
    ),
    QuerySpec(
        "stream_full_outer_join",
        stream_full_outer_join,
        STREAM_FULL_OUTER_SQL,
        ("streaming", "join"),
        doc="FULL OUTER stream-stream join: watermark-flushed unmatched "
        "rows on BOTH sides equal the batch full join (completes the "
        "inner/left/full stream-join matrix).",
    ),
    QuerySpec(
        "stream_upsert_user_totals",
        stream_upsert_user_totals,
        STREAM_UPSERT_SQL,
        ("streaming", "sink"),
        doc="foreachBatch keyed upsert into a parquet table (idempotent "
        "MERGE pattern, atomic snapshot swap); multi-batch replay.",
    ),
    QuerySpec("stream_session_aggregate", stream_session_aggregate, STREAM_SESSION_SQL, ("streaming",)),
    QuerySpec("stream_key_dedup", stream_key_dedup, STREAM_KEY_DEDUP_SQL, ("streaming",)),
    QuerySpec(
        "stream_sliding_counts", stream_sliding_counts, STREAM_SLIDING_SQL,
        ("streaming", "window"),
        doc="Sliding-window stream agg (30 min window, 10 min slide).",
    ),
    QuerySpec(
        "stream_watermark_dedup", stream_watermark_dedup, STREAM_WM_DEDUP_SQL,
        ("streaming",),
        doc="dropDuplicatesWithinWatermark: state bounded by the horizon.",
    ),
    QuerySpec("stream_stateful_user_stats", stream_stateful_user_stats, STREAM_STATEFUL_SQL, ("streaming", "udf")),
    QuerySpec(
        "stream_burst_throttle",
        stream_burst_throttle,
        STREAM_BURST_THROTTLE_SQL,
        ("streaming", "state", "filter"),
        doc="Online notification-throttle: first event of each 30-min "
        "burst per (user, type) via one long of keyed state; oracle = "
        "the batch window-lag plan (round 11).",
    ),
    QuerySpec(
        "stream_static_enrich",
        stream_static_enrich,
        STREAM_STATIC_ENRICH_SQL,
        ("streaming", "join"),
        doc="Stream-static dimension enrichment (per-batch broadcast of "
        "the dim, zero stream-side join state).",
    ),
]
