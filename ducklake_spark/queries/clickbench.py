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


# --- round 5: the remaining ClickBench shapes -----------------------------
# (reference test/sql/clickbench/clickbench.test_slow:35-248, adapted to
# the driver's events table: props plays URL/SearchPhrase, user_id plays
# UserID/ClientIP, value plays ResolutionWidth. ClickBench's bare
# ORDER BY c DESC LIMIT N is tie-nondeterministic, so every LIMIT here
# adds a key tiebreak on BOTH sides; averages go through DECIMAL sums.)

_AVG_VALUE = "CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)"

sql_query(
    "cb_multi_agg",
    f"""
    SELECT CAST(SUM(user_id) AS BIGINT) AS sum_uid, COUNT(*) AS n,
           {_AVG_VALUE} AS avg_value
    FROM events
    """,
    tables=["events"],
    doc="whole-table multi-aggregate scan (ClickBench q2)",
)

sql_query(
    "cb_count_distincts",
    """
    SELECT COUNT(DISTINCT user_id) AS n_users,
           COUNT(DISTINCT props) AS n_props,
           COUNT(DISTINCT event_type) AS n_types
    FROM events
    """,
    tables=["events"],
    doc="global distinct counts over int and string keys (ClickBench q4-q6)",
)

sql_query(
    "cb_minmax_date",
    """
    SELECT MIN(CAST(ts AS DATE)) AS d_min, MAX(CAST(ts AS DATE)) AS d_max
    FROM events
    """,
    tables=["events"],
    doc="min/max over the time column (ClickBench q7)",
)

sql_query(
    "cb_group_topk_strings",
    """
    SELECT props, COUNT(*) AS c
    FROM events
    WHERE props <> ''
    GROUP BY props
    ORDER BY c DESC, props
    LIMIT 10
    """,
    tables=["events"],
    doc="string-key top-K by frequency (ClickBench q13)",
)

sql_query(
    "cb_two_key_distinct",
    """
    SELECT event_type, props, COUNT(DISTINCT user_id) AS u, COUNT(*) AS c
    FROM events
    WHERE props <> ''
    GROUP BY event_type, props
    ORDER BY u DESC, c DESC, event_type, props
    LIMIT 10
    """,
    tables=["events"],
    doc="two-key group with distinct-count top-K (ClickBench q15-q17)",
)

sql_query(
    "cb_point_lookup",
    """
    SELECT user_id, COUNT(*) AS n
    FROM events
    WHERE user_id = 7
    GROUP BY user_id
    """,
    tables=["events"],
    doc="single-key point lookup (ClickBench q20; zone-map prune shape)",
)

sql_query(
    "cb_like_scan",
    """
    SELECT COUNT(*) AS n
    FROM events
    WHERE props LIKE '%"k": 6%'
    """,
    tables=["events"],
    doc="LIKE substring scan over the string column (ClickBench q21)",
)

sql_query(
    "cb_like_group_min",
    """
    SELECT event_type, MIN(props) AS first_prop, COUNT(*) AS c
    FROM events
    WHERE props LIKE '%9%' AND event_type <> ''
    GROUP BY event_type
    ORDER BY c DESC, event_type
    LIMIT 10
    """,
    tables=["events"],
    doc="LIKE filter + per-group MIN(string) top-K (ClickBench q22-q23)",
)

sql_query(
    "cb_argmax_props",
    """
    SELECT event_type, props AS top_prop
    FROM (
        SELECT event_type, props,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type
                   ORDER BY value DESC, event_id
               ) AS rn
        FROM events
    ) t
    WHERE rn = 1
    ORDER BY event_type
    """,
    tables=["events"],
    doc="argMax: the props of each type's highest-value event "
        "(deterministic via event_id tiebreak; ClickBench q24/q28 MIN(URL) "
        "family)",
)

sql_query(
    "cb_sum_chain",
    "SELECT "
    + ", ".join(
        f"CAST(SUM(CAST(value AS DECIMAL(12,2)) + {k}) AS DOUBLE) AS s{k}"
        for k in range(10)
    )
    + " FROM events",
    tables=["events"],
    doc="wide chain of shifted SUM aggregates in one pass (ClickBench q29)",
)

sql_query(
    "cb_subquery_stats",
    """
    SELECT MIN(c) AS min_c, MAX(c) AS max_c, COUNT(*) AS n
    FROM (
        SELECT user_id, props, COUNT(*) AS c
        FROM events
        WHERE props <> ''
        GROUP BY user_id, props
        ORDER BY c DESC, user_id, props
        LIMIT 10
    ) t
    """,
    tables=["events"],
    doc="MIN/MAX/COUNT over a top-K subquery (ClickBench q31-q32)",
)

sql_query(
    "cb_expr_group",
    """
    SELECT user_id, user_id - 1 AS u1, user_id - 2 AS u2, COUNT(*) AS c
    FROM events
    GROUP BY user_id, user_id - 1, user_id - 2
    ORDER BY c DESC, user_id
    LIMIT 10
    """,
    tables=["events"],
    doc="grouping by derived expression columns (ClickBench q33)",
)

sql_query(
    "cb_date_window_offset",
    """
    SELECT DATE_TRUNC('minute', ts) AS m, COUNT(*) AS page_views
    FROM events
    WHERE CAST(ts AS DATE) >= DATE '2024-01-01'
      AND CAST(ts AS DATE) <= DATE '2024-01-02'
    GROUP BY DATE_TRUNC('minute', ts)
    ORDER BY m
    LIMIT 10 OFFSET 20
    """,
    tables=["events"],
    doc="date-window rollup paged with LIMIT/OFFSET (ClickBench q42)",
)

sql_query(
    "cb_interleaved_sort",
    """
    SELECT user_id, page_views
    FROM (
        SELECT user_id, COUNT(*) AS page_views
        FROM events
        WHERE event_type = 'view'
        GROUP BY user_id
        ORDER BY page_views DESC, user_id
        LIMIT 10 OFFSET 5
    ) t
    ORDER BY user_id
    LIMIT 5 OFFSET 2
    """,
    tables=["events"],
    doc="inner frequency sort + outer key sort with stacked OFFSETs "
        "(ClickBench q38-q41 interleaved-sort family)",
)
