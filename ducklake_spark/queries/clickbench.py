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


# --- round 6: full 43-shape coverage --------------------------------------
# The classes the round-5 pass left out (clickbench.test_slow:35-248):
# plain/filtered COUNT(*), AVG over the big int key, region-style
# segmentation with distinct counts, the search-phrase families, raw
# ORDER-BY-string paging, URL/referrer string surgery (LENGTH averages,
# domain REGEXP_REPLACE with HAVING), IP-arithmetic group keys, literal
# group keys, GROUP BY ALL + deep OFFSET, and the CASE src/dst rollup.

sql_query(
    "cb_count_star",
    "SELECT COUNT(*) AS n FROM events",
    tables=["events"],
    doc="bare COUNT(*) (ClickBench q0; metadata-foldable scan)",
)

sql_query(
    "cb_filtered_count",
    "SELECT COUNT(*) AS n FROM events WHERE event_type <> 'view'",
    tables=["events"],
    doc="filtered COUNT(*) (ClickBench q1: AdvEngineID <> 0)",
)

sql_query(
    "cb_avg_bigkey",
    """
    SELECT CAST(SUM(CAST(user_id AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*)
               AS avg_uid
    FROM events
    """,
    tables=["events"],
    doc="AVG over the wide integer key (ClickBench q3: AVG(UserID)); "
        "decimal sum keeps the division bit-identical across engines",
)

sql_query(
    "cb_region_distinct",
    """
    SELECT user_id % 20 AS region, COUNT(DISTINCT user_id) AS u
    FROM events
    GROUP BY user_id % 20
    ORDER BY u DESC, region
    LIMIT 10
    """,
    tables=["events"],
    doc="region segmentation by distinct users (ClickBench q8)",
)

sql_query(
    "cb_region_multi_agg",
    f"""
    SELECT user_id % 20 AS region,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
           COUNT(*) AS c,
           {_AVG_VALUE} AS avg_value,
           COUNT(DISTINCT user_id) AS u
    FROM events
    GROUP BY user_id % 20
    ORDER BY c DESC, region
    LIMIT 10
    """,
    tables=["events"],
    doc="region rollup: sum + count + avg + distinct in one pass "
        "(ClickBench q9)",
)

sql_query(
    "cb_phrase_topk",
    """
    SELECT props, COUNT(DISTINCT user_id) AS u
    FROM events
    WHERE props <> '' AND event_type = 'click'
    GROUP BY props
    ORDER BY u DESC, props
    LIMIT 10
    """,
    tables=["events"],
    doc="search-phrase distinct-user top-K (ClickBench q10-q14 family: "
        "non-empty filter + group + distinct + frequency order)",
)

sql_query(
    "cb_user_phrase_group",
    """
    SELECT user_id, props, COUNT(*) AS c
    FROM events
    GROUP BY user_id, props
    ORDER BY c DESC, user_id, props
    LIMIT 10
    """,
    tables=["events"],
    doc="UserID x phrase frequency (ClickBench q16-q17)",
)

sql_query(
    "cb_user_minute_phrase",
    """
    SELECT user_id, EXTRACT(MINUTE FROM ts) AS m, props, COUNT(*) AS c
    FROM events
    GROUP BY user_id, EXTRACT(MINUTE FROM ts), props
    ORDER BY c DESC, user_id, m, props
    LIMIT 10
    """,
    tables=["events"],
    doc="UserID x minute x phrase with an extracted time part in the "
        "group key (ClickBench q18)",
)

sql_query(
    "cb_order_by_string",
    """
    SELECT props
    FROM events
    WHERE props <> ''
    ORDER BY props
    LIMIT 10
    """,
    tables=["events"],
    doc="raw string sort paging, no aggregation (ClickBench q24)",
)

sql_query(
    "cb_order_by_time_string",
    """
    SELECT props
    FROM events
    WHERE props <> ''
    ORDER BY ts, props, event_id
    LIMIT 10
    """,
    tables=["events"],
    doc="time-then-string sort paging (ClickBench q25; event_id breaks "
        "equal-timestamp ties deterministically)",
)

sql_query(
    "cb_strlen_having",
    """
    SELECT user_id,
           CAST(SUM(CAST(LENGTH(props) AS DECIMAL(18,0))) AS DOUBLE)
               / COUNT(*) AS l,
           COUNT(*) AS c
    FROM events
    WHERE props <> ''
    GROUP BY user_id
    HAVING COUNT(*) > 20
    ORDER BY l DESC, user_id
    LIMIT 25
    """,
    tables=["events"],
    doc="average string length per key with a HAVING floor "
        "(ClickBench q26: AVG(STRLEN(URL)) HAVING c > 100000)",
)

# domain extraction: Spark backrefs are $1, DuckDB's are \1 — same
# pattern text otherwise (strip everything but the digits of "k")
_DOMAIN_BODY = """
    SELECT k, CAST(SUM(CAST(LENGTH(props) AS DECIMAL(18,0))) AS DOUBLE)
               / COUNT(*) AS l,
           COUNT(*) AS c, MIN(props) AS min_prop
    FROM (
        SELECT props,
               REGEXP_REPLACE(props, '^.*"k": ([0-9]+).*$', '{br}1') AS k
        FROM events
        WHERE props <> ''
    ) t
    GROUP BY k
    HAVING COUNT(*) > 50
    ORDER BY l DESC, k
    LIMIT 25
"""

sql_query(
    "cb_domain_extract",
    _DOMAIN_BODY.format(br="$"),
    oracle=_DOMAIN_BODY.format(br="\\"),
    tables=["events"],
    doc="referrer-domain surgery: REGEXP_REPLACE key + length average + "
        "HAVING + MIN(string) (ClickBench q27)",
)

sql_query(
    "cb_engine_ip_group",
    f"""
    SELECT event_type, user_id, COUNT(*) AS c,
           CAST(SUM(CASE WHEN value < 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_refresh,
           {_AVG_VALUE} AS avg_value
    FROM events
    WHERE props <> ''
    GROUP BY event_type, user_id
    ORDER BY c DESC, event_type, user_id
    LIMIT 10
    """,
    tables=["events"],
    doc="engine x IP rollup with a conditional SUM (ClickBench q30: "
        "SUM(IsRefresh))",
)

sql_query(
    "cb_ip_arithmetic_group",
    """
    SELECT user_id, user_id - 1 AS u1, user_id - 2 AS u2, user_id - 3 AS u3,
           COUNT(*) AS c
    FROM events
    GROUP BY user_id, user_id - 1, user_id - 2, user_id - 3
    ORDER BY c DESC, user_id
    LIMIT 10
    """,
    tables=["events"],
    doc="four shifted copies of the key as group columns "
        "(ClickBench q36: ClientIP - 1/2/3)",
)

sql_query(
    "cb_literal_group",
    """
    SELECT 1 AS one, props, COUNT(*) AS c
    FROM events
    GROUP BY 1, props
    ORDER BY c DESC, props
    LIMIT 10
    """,
    tables=["events"],
    doc="constant in the group key (ClickBench q35: GROUP BY 1, URL)",
)

sql_query(
    "cb_groupby_all_offset",
    """
    SELECT MIN(page_views) AS min_pv, MAX(page_views) AS max_pv,
           COUNT(*) AS n
    FROM (
        SELECT props, COUNT(*) AS page_views
        FROM events
        WHERE event_type <> 'error' AND props <> ''
        GROUP BY ALL
        ORDER BY page_views DESC, props
        LIMIT 10 OFFSET 50
    ) t
    """,
    tables=["events"],
    doc="GROUP BY ALL + deep OFFSET page folded to min/max/count "
        "(ClickBench q39)",
)

sql_query(
    "cb_case_src_dst",
    """
    SELECT MIN(page_views) AS min_pv, MAX(page_views) AS max_pv,
           COUNT(*) AS n
    FROM (
        SELECT event_type,
               CASE WHEN event_type IN ('view', 'click')
                    THEN props ELSE '' END AS src,
               props AS dst,
               COUNT(*) AS page_views
        FROM events
        WHERE value >= 1
        GROUP BY event_type,
                 CASE WHEN event_type IN ('view', 'click')
                      THEN props ELSE '' END,
                 props
        ORDER BY page_views DESC, event_type, src, dst
        LIMIT 10 OFFSET 100
    ) t
    """,
    tables=["events"],
    doc="CASE-derived src/dst traffic rollup behind a deep OFFSET "
        "(ClickBench q40)",
)

sql_query(
    "cb_two_dim_window",
    """
    SELECT MIN(page_views) AS min_pv, MAX(page_views) AS max_pv,
           COUNT(*) AS n
    FROM (
        SELECT CAST(value AS INT) AS w, EXTRACT(HOUR FROM ts) AS h,
               COUNT(*) AS page_views
        FROM events
        WHERE event_type = 'view'
        GROUP BY CAST(value AS INT), EXTRACT(HOUR FROM ts)
        ORDER BY page_views DESC, w, h
        LIMIT 10 OFFSET 30
    ) t
    """,
    tables=["events"],
    doc="two derived dimensions paged then folded (ClickBench q41: "
        "WindowClientWidth x WindowClientHeight)",
)

sql_query(
    "cb_mobile_two_key_distinct",
    """
    SELECT event_type,
           REGEXP_EXTRACT(props, '([0-9])', 1) AS model,
           COUNT(DISTINCT user_id) AS u
    FROM events
    WHERE props <> ''
    GROUP BY event_type, REGEXP_EXTRACT(props, '([0-9])', 1)
    ORDER BY u DESC, event_type, model
    LIMIT 10
    """,
    tables=["events"],
    doc="two-key segmentation x distinct users (ClickBench q11: "
        "MobilePhone x MobilePhoneModel COUNT(DISTINCT UserID))",
)

sql_query(
    "cb_phrase_count_topk",
    """
    SELECT props, COUNT(*) AS c
    FROM events
    WHERE props <> ''
    GROUP BY props
    ORDER BY c DESC, props
    LIMIT 10
    """,
    tables=["events"],
    doc="plain frequency top-K over non-empty phrases (ClickBench q12: "
        "SearchPhrase COUNT(*); q13's distinct variant is "
        "cb_phrase_topk)",
)

sql_query(
    "cb_point_select_rows",
    """
    SELECT user_id
    FROM events
    WHERE user_id = 42
    """,
    tables=["events"],
    doc="bare point-predicate row select, no aggregation (ClickBench "
        "q19: SELECT UserID WHERE UserID = const; exercises zone-map "
        "file pruning with a projection of only the filter column)",
)

sql_query(
    "cb_filtered_url_topk",
    """
    SELECT props, COUNT(*) AS page_views
    FROM events
    WHERE event_type = 'view'
      AND CAST(ts AS DATE) >= DATE '2024-01-07'
      AND CAST(ts AS DATE) <= DATE '2024-01-14'
      AND value >= 0.5
      AND props <> ''
    GROUP BY props
    ORDER BY page_views DESC, props
    LIMIT 10
    """,
    tables=["events"],
    doc="multi-predicate (type + date range + measure floor + non-empty) "
        "filtered frequency top-K (ClickBench q34/q35: CounterID + "
        "EventDate range + flag filters over URL/Title)",
)

sql_query(
    "cb_hash_date_paging",
    """
    SELECT page_views, props, d
    FROM (
        SELECT props, CAST(ts AS DATE) AS d, COUNT(*) AS page_views
        FROM events
        WHERE event_type IN ('view', 'click') AND user_id % 10 = 7
        GROUP BY props, CAST(ts AS DATE)
        ORDER BY page_views DESC, props, d
        LIMIT 10 OFFSET 5
    ) t
    ORDER BY page_views DESC, props, d
    LIMIT 5 OFFSET 2
    """,
    tables=["events"],
    doc="IN-list + modulus equality filter, grouped by key x day, paged "
        "twice with nested ORDER/OFFSET/LIMIT (ClickBench q37: URLHash "
        "x EventDate, TraficSourceID IN (-1,6), RefererHash = const)",
)
