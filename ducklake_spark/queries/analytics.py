"""Event-stream analytics over the ``events`` table.

Exercises the windowing / sessionization / rollup / pivot / as-of
surface a streaming-ish workload needs (reference scope note: the
reference has no streaming engine — SURVEY §2.10; these are the
Spark-native batch equivalents, with the streaming variants living in
``ducklake_spark.streaming``).

Determinism: window ORDER BY always includes ``event_id`` as a
tiebreak; monetary sums go through DECIMAL.
"""

from __future__ import annotations

from ducklake_spark.queries import sql_query

DECV = "CAST(value AS DECIMAL(12,2))"

sql_query(
    "ev_hourly_rollup",
    f"""
    SELECT
        CAST(date_trunc('hour', ts) AS STRING) AS hour,
        event_type,
        COUNT(*) AS n_events,
        COUNT(DISTINCT user_id) AS n_users,
        CAST(SUM({DECV}) AS DOUBLE) AS total_value,
        CAST(MIN({DECV}) AS DOUBLE) AS min_value,
        CAST(MAX({DECV}) AS DOUBLE) AS max_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    ORDER BY hour, event_type
    """,
    tables=["events"],
    doc="hourly per-type rollup (time bucketing)",
)

sql_query(
    "ev_topk_users",
    f"""
    SELECT event_type, user_id, total_value, rn
    FROM (
        SELECT
            event_type,
            user_id,
            CAST(SUM({DECV}) AS DOUBLE) AS total_value,
            ROW_NUMBER() OVER (
                PARTITION BY event_type
                ORDER BY SUM({DECV}) DESC, user_id
            ) AS rn
        FROM events
        GROUP BY event_type, user_id
    ) ranked
    WHERE rn <= 3
    ORDER BY event_type, rn
    """,
    tables=["events"],
    doc="top-3 users by value per event type (window over agg)",
)

sql_query(
    "ev_sessionize",
    # Spark side counts sessions as SUM(new_session): the running-sum
    # session_id is nondecreasing and increments exactly on the flagged
    # rows, so COUNT(DISTINCT session_id) == SUM(new_session) per user —
    # one LAG window (partitioned by user_id) feeds a groupBy on the
    # SAME key (no second exchange), dropping the cumulative-sum window
    # pass and the count-distinct Expand. The oracle keeps the
    # canonical lag + cumulative-sum + distinct text, so the driver
    # still hash-checks the textbook semantics.
    """
    WITH flagged AS (
        SELECT
            user_id,
            CASE
                WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
                WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > INTERVAL 30 MINUTE THEN 1
                ELSE 0
            END AS new_session
        FROM events
    )
    SELECT user_id,
           CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM flagged
    GROUP BY user_id
    ORDER BY user_id
    """,
    oracle="""
    WITH flagged AS (
        SELECT
            user_id,
            ts,
            CASE
                WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
                WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > INTERVAL 30 MINUTE THEN 1
                ELSE 0
            END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT
            user_id,
            SUM(new_session) OVER (
                PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS session_id
        FROM flagged
    )
    SELECT user_id,
           COUNT(DISTINCT session_id) AS n_sessions,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id
    ORDER BY user_id
    """,
    tables=["events"],
    doc="gap-based sessionization (lag + cumulative sum)",
)

sql_query(
    "ev_running_value",
    f"""
    SELECT
        event_id,
        user_id,
        CAST(SUM({DECV}) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS DOUBLE) AS running_value,
        CAST(SUM({DECV}) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
        ) AS DOUBLE) / COUNT(*) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
        ) AS moving_avg_5
    FROM events
    ORDER BY user_id, event_id
    """,
    tables=["events"],
    doc="running total + 5-row moving average per user",
)

sql_query(
    "ev_type_pivot",
    f"""
    SELECT
        user_id,
        COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS clicks,
        COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS views,
        COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases,
        COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signups,
        COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS errors,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN {DECV}
                      ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS purchase_value
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    tables=["events"],
    doc="pivot event types to columns (conditional aggregation)",
)

sql_query(
    "ev_daily_rollup_cube",
    f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type, {DECV} AS v
        FROM events
    )
    SELECT
        CAST(day AS STRING) AS day,
        event_type,
        COUNT(*) AS n,
        CAST(SUM(v) AS DOUBLE) AS total_value
    FROM daily
    GROUP BY ROLLUP(day, event_type)
    ORDER BY day, event_type
    """,
    tables=["events"],
    doc="ROLLUP grouping sets over day × event_type",
)

sql_query(
    "ev_json_props",
    """
    SELECT
        event_type,
        CAST(SUM(CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        COUNT(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    oracle="""
    SELECT
        event_type,
        CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        COUNT(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tables=["events"],
    doc="JSON property extraction (dialect: get_json_object vs json_extract_string)",
)

sql_query(
    "ev_asof_last_click",
    """
    SELECT
        p.event_id,
        p.user_id,
        CAST((
            SELECT MAX(c.ts) FROM events c
            WHERE c.user_id = p.user_id
              AND c.event_type = 'click'
              AND c.ts <= p.ts
        ) AS STRING) AS last_click_ts
    FROM events p
    WHERE p.event_type = 'purchase'
    ORDER BY p.event_id
    """,
    tables=["events"],
    doc="as-of join: latest click at-or-before each purchase (correlated MAX)",
)
