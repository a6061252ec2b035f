"""ClickBench-flavored event analytics (reference parity: the host
engine's analytic-SQL obligations exercised by
test/sql/clickbench/clickbench.test_slow — distinct counts, quantiles,
regex, funnels, retention — adapted to the driver's ``events`` table).

Determinism: quantiles use exact linear interpolation (Spark
``percentile`` == DuckDB ``quantile_cont``) over DECIMAL-rounded
inputs so both engines interpolate identical values; every output is
either integral, exactly-representable, or rounded after an
order-independent aggregate.
"""

from __future__ import annotations

from ducklake_spark.queries import sql_query

sql_query(
    "cb_distinct_users",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tables=["events"],
    doc="distinct-count per event type (ClickBench q5-style)",
)

# value has exactly 2 decimal digits -> quantile over integer cents:
# both engines then interpolate doubles between exactly-representable
# ints with the same p literal, so results agree bit-for-bit (DECIMAL
# inputs would make DuckDB interpolate in decimal and truncate).
_QUANTILES = """
    WITH cents AS (
        SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c FROM events
    )
    SELECT event_type,
           ROUND({q}(c, 0.5) / 100, 4) AS p50,
           ROUND({q}(c, 0.9) / 100, 4) AS p90,
           ROUND({q}(c, 0.99) / 100, 4) AS p99
    FROM cents
    GROUP BY event_type
    ORDER BY event_type
"""

sql_query(
    "cb_value_quantiles",
    _QUANTILES.format(q="percentile"),
    oracle=_QUANTILES.format(q="quantile_cont"),
    tables=["events"],
    doc="exact interpolated quantiles of event value per type (cent-scaled)",
)

sql_query(
    "cb_regex_props",
    """
    SELECT CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k,
           COUNT(*) AS n
    FROM events
    WHERE props LIKE '%"k"%'
    GROUP BY 1
    HAVING COUNT(*) > 1
    ORDER BY k
    """,
    oracle="""
    SELECT CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k,
           COUNT(*) AS n
    FROM events
    WHERE props LIKE '%"k"%'
    GROUP BY 1
    HAVING COUNT(*) > 1
    ORDER BY k
    """,
    tables=["events"],
    doc="regex extraction + group (ClickBench q28-style)",
)

sql_query(
    "cb_funnel_view_click",
    """
    WITH v AS (
        SELECT user_id, MIN(ts) AS first_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT v.user_id,
           COUNT(c.ts) AS clicks_after_first_view
    FROM v LEFT JOIN c ON c.user_id = v.user_id AND c.ts > v.first_view
    GROUP BY v.user_id
    ORDER BY v.user_id
    """,
    tables=["events"],
    doc="view->click funnel per user (sequence predicate join)",
)

sql_query(
    "cb_daily_retention",
    """
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    )
    SELECT a.d AS day,
           COUNT(DISTINCT a.user_id) AS active,
           COUNT(DISTINCT b.user_id) AS retained_next_day
    FROM days a
    LEFT JOIN days b ON b.user_id = a.user_id AND b.d = a.d + INTERVAL 1 DAY
    GROUP BY a.d
    ORDER BY day
    """,
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    )
    SELECT a.d AS day,
           COUNT(DISTINCT a.user_id) AS active,
           COUNT(DISTINCT b.user_id) AS retained_next_day
    FROM days a
    LEFT JOIN days b ON b.user_id = a.user_id AND b.d = a.d + INTERVAL 1 DAY
    GROUP BY a.d
    ORDER BY day
    """,
    tables=["events"],
    doc="next-day retention (self-join on day+1)",
)

sql_query(
    "cb_top_pairs",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS next_type
        FROM events
    )
    SELECT event_type, next_type, COUNT(*) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    ORDER BY n DESC, event_type, next_type
    LIMIT 10
    """,
    tables=["events"],
    doc="most frequent consecutive event-type transitions (window LEAD)",
)
