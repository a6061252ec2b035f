"""TPC-H q1–q22 adapted to the driver's star schema.

The synthetic schema (FIXTURES.md §A) is TPC-H minus ``partsupp`` and
several columns (no l_commitdate/l_receiptdate/l_shipmode, no
c_address/phone, no p_container/p_mfgr, no o_shippriority). Queries
keep the original's *shape* (same joins/subquery structure, same
operator exercise list as reference test/sql/tpch/tpch_sf1.test_slow)
with predicates rewritten onto existing columns.

Dialect: every query here parses identically in Spark SQL and DuckDB,
so the oracle shares the text (``oracle="same"``).
"""

from __future__ import annotations

from ducklake_spark.queries import sql_query


def dec(col: str, p: int = 12, s: int = 2) -> str:
    """Exact decimal view of a 2-decimal-digit double column."""
    return f"CAST({col} AS DECIMAL({p},{s}))"


# l_extendedprice * (1 - l_discount) in exact decimal arithmetic.
DISC_PRICE = f"{dec('l_extendedprice')} * CAST(1 - l_discount AS DECIMAL(4,2))"
CHARGE = f"{DISC_PRICE} * CAST(1 + l_tax AS DECIMAL(4,2))"

sql_query(
    "tpch_q01",
    f"""
    SELECT
        l_returnflag,
        l_linestatus,
        CAST(SUM({dec('l_quantity')}) AS DOUBLE) AS sum_qty,
        CAST(SUM({dec('l_extendedprice')}) AS DOUBLE) AS sum_base_price,
        CAST(SUM({DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
        CAST(SUM({CHARGE}) AS DOUBLE) AS sum_charge,
        CAST(SUM({dec('l_quantity')}) AS DOUBLE) / COUNT(*) AS avg_qty,
        CAST(SUM({dec('l_extendedprice')}) AS DOUBLE) / COUNT(*) AS avg_price,
        CAST(SUM({dec('l_discount', 4)}) AS DOUBLE) / COUNT(*) AS avg_disc,
        COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-06-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tables=["lineitem"],
    doc="pricing summary report (agg + 8 measures)",
)

sql_query(
    "tpch_q02",
    # the correlated form's bare `s_nationkey` bound to the inner s2 in
    # BOTH engines, silently making it a 1-row global-max query; the
    # window form is the real per-nation top (25 rows at sf0.1) and
    # needs one pass instead of decorrelated agg + join (−29%
    # interleaved). The oracle keeps a correlated form with the outer
    # reference properly qualified.
    """
    SELECT r_name, n_name, s_name, s_acctbal
    FROM (SELECT s_name, s_acctbal, s_nationkey,
                 MAX(s_acctbal) OVER (PARTITION BY s_nationkey) AS mx
          FROM supplier) s, nation, region
    WHERE s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND s_acctbal = mx
    ORDER BY s_acctbal DESC, n_name, s_name
    """,
    oracle="""
    SELECT r_name, n_name, s_name, s_acctbal
    FROM supplier, nation, region
    WHERE s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND s_acctbal = (
          SELECT MAX(s2.s_acctbal) FROM supplier s2
          WHERE s2.s_nationkey = supplier.s_nationkey
      )
    ORDER BY s_acctbal DESC, n_name, s_name
    """,
    tables=["supplier", "nation", "region"],
    doc="min-cost-supplier analogue: top-acctbal supplier per nation (windowed per-nation max)",
)

sql_query(
    "tpch_q03",
    f"""
    SELECT
        l_orderkey,
        CAST(SUM({DISC_PRICE}) AS DOUBLE) AS revenue,
        CAST(o_orderdate AS DATE) AS o_orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    tables=["customer", "orders", "lineitem"],
    doc="shipping priority (3-way join + topN)",
)

sql_query(
    "tpch_q04",
    # EXISTS(l_shipdate > o_orderdate+30) ⟺ per-order MAX(l_shipdate)
    # exceeds the bound, and any qualifying lineitem has
    # l_shipdate > min(o_orderdate)+30 = 1997-07-31 — so the semi join
    # becomes prefilter + map-side-partial MAX + equi-join. This
    # replaces a full-lineitem sort-merge LeftSemi with a correlated
    # non-equi condition (−27% interleaved at sf0.1, and strictly
    # fewer rows shuffled at any scale). Oracle keeps the canonical
    # EXISTS text.
    """
    WITH ms AS (
        SELECT l_orderkey, MAX(l_shipdate) AS m
        FROM lineitem
        WHERE l_shipdate > TIMESTAMP '1997-07-31 00:00:00'
        GROUP BY l_orderkey
    )
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders JOIN ms ON o_orderkey = l_orderkey
    WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
      AND m > o_orderdate + INTERVAL 30 DAY
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tables=["orders", "lineitem"],
    doc="order priority checking (EXISTS as per-order max-shipdate bound)",
)

sql_query(
    "tpch_q05",
    f"""
    SELECT n_name, CAST(SUM({DISC_PRICE}) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
    doc="local supplier volume (6-way join)",
)

sql_query(
    "tpch_q06",
    f"""
    SELECT CAST(SUM({dec('l_extendedprice')} * {dec('l_discount', 4)}) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.03 AND l_discount <= 0.05
      AND l_quantity < 24
    """,
    tables=["lineitem"],
    doc="forecasting revenue change (selective scan + agg)",
)

sql_query(
    "tpch_q07",
    f"""
    SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
        SELECT
            n1.n_name AS supp_nation,
            n2.n_name AS cust_nation,
            YEAR(l_shipdate) AS l_year,
            {DISC_PRICE} AS volume
        FROM supplier, lineitem, orders, customer, nation n1, nation n2
        WHERE s_suppkey = l_suppkey
          AND o_orderkey = l_orderkey
          AND c_custkey = o_custkey
          AND s_nationkey = n1.n_nationkey
          AND c_nationkey = n2.n_nationkey
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                             AND TIMESTAMP '1997-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="volume shipping between nation pair",
)

sql_query(
    "tpch_q08",
    f"""
    SELECT
        o_year,
        CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
          / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
        SELECT
            YEAR(o_orderdate) AS o_year,
            {DISC_PRICE} AS volume,
            n2.n_name AS nation
        FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
        WHERE p_partkey = l_partkey
          AND s_suppkey = l_suppkey
          AND l_orderkey = o_orderkey
          AND o_custkey = c_custkey
          AND c_nationkey = n1.n_nationkey
          AND n1.n_regionkey = r_regionkey
          AND r_name = 'AMERICA'
          AND s_nationkey = n2.n_nationkey
          AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                              AND TIMESTAMP '1997-12-31 00:00:00'
          AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="national market share (8-way join + conditional agg)",
)

sql_query(
    "tpch_q09",
    f"""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
        SELECT
            n_name AS nation,
            YEAR(o_orderdate) AS o_year,
            {DISC_PRICE} AS amount
        FROM part, supplier, lineitem, orders, nation
        WHERE s_suppkey = l_suppkey
          AND p_partkey = l_partkey
          AND o_orderkey = l_orderkey
          AND s_nationkey = n_nationkey
          AND p_name LIKE '%bolt%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    doc="product type profit (LIKE filter through 5-way join)",
)

sql_query(
    "tpch_q10",
    f"""
    SELECT
        c_custkey,
        c_name,
        CAST(SUM({DISC_PRICE}) AS DOUBLE) AS revenue,
        c_acctbal,
        n_name,
        c_mktsegment
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="returned item reporting (topN customers)",
)

sql_query(
    "tpch_q11",
    # the HAVING threshold (global sum * 1.5 / distinct partkeys) is
    # derivable from the per-partkey aggregate itself: a one-row scalar
    # re-aggregate of `per`, broadcast-cross-joined back, replaces the
    # second full lineitem join pass. An empty-frame `OVER ()` window
    # would compute the same threshold but Spark plans it as "move ALL
    # rows to one partition" — a single-task sort at 100× scale —
    # whereas the cross join keeps every stage fully parallel and
    # ReuseExchange dedupes `per`'s shuffle so lineitem is still
    # scanned once. DECIMAL group sums re-add exactly, so the
    # threshold is bit-identical to the oracle's.
    f"""
    WITH per AS (
        SELECT l_partkey, SUM({dec('l_quantity')} * {dec('l_extendedprice')}) AS v
        FROM lineitem, supplier, nation
        WHERE l_suppkey = s_suppkey
          AND s_nationkey = n_nationkey
          AND n_name = 'NATION_1'
        GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(v AS DOUBLE) AS value
    FROM per, (SELECT SUM(v) AS tot, COUNT(*) AS n FROM per) t
    WHERE CAST(v AS DOUBLE) > CAST(tot AS DOUBLE) * 1.5 / n
    ORDER BY value DESC, l_partkey
    """,
    oracle=f"""
    SELECT l_partkey, CAST(SUM({dec('l_quantity')} * {dec('l_extendedprice')}) AS DOUBLE) AS value
    FROM lineitem, supplier, nation
    WHERE l_suppkey = s_suppkey
      AND s_nationkey = n_nationkey
      AND n_name = 'NATION_1'
    GROUP BY l_partkey
    HAVING CAST(SUM({dec('l_quantity')} * {dec('l_extendedprice')}) AS DOUBLE) > (
        SELECT CAST(SUM({dec('l_quantity')} * {dec('l_extendedprice')}) AS DOUBLE) * 1.5
               / COUNT(DISTINCT l_partkey)
        FROM lineitem, supplier, nation
        WHERE l_suppkey = s_suppkey
          AND s_nationkey = n_nationkey
          AND n_name = 'NATION_1'
    )
    ORDER BY value DESC, l_partkey
    """,
    doc="important stock identification (single-pass window threshold; partsupp-free analogue)",
)

sql_query(
    "tpch_q12",
    """
    SELECT
        o_orderpriority,
        CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished_count,
        CAST(SUM(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT) AS open_count,
        COUNT(*) AS line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate > o_orderdate
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tables=["orders", "lineitem"],
    doc="shipping modes / order priority (conditional counts; shipmode-free analogue)",
)

sql_query(
    "tpch_q13",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tables=["customer", "orders"],
    doc="customer order-count distribution (outer join + double agg)",
)

sql_query(
    "tpch_q14",
    f"""
    SELECT
        100.00 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {DISC_PRICE}
                               ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
               / CAST(SUM({DISC_PRICE}) AS DOUBLE) AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
    """,
    tables=["lineitem", "part"],
    doc="promotion effect",
)

sql_query(
    "tpch_q15",
    f"""
    WITH revenue AS (
        -- the explicit IS NOT NULL mirrors the join branch's pushed
        -- null filter so BOTH consumers (supplier join, scalar MAX)
        -- plan byte-identical scan+partial-agg subtrees and AQE's
        -- exchange reuse scans lineitem once; without it only the join
        -- branch gets isnotnull(l_suppkey) and reuse misses
        SELECT l_suppkey AS supplier_no, SUM({DISC_PRICE}) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
          AND l_suppkey IS NOT NULL
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier
    JOIN revenue r ON s_suppkey = supplier_no
    JOIN (SELECT MAX(total_revenue) AS mx FROM revenue) m
      ON total_revenue = mx
    ORDER BY s_suppkey
    """,
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, SUM({DISC_PRICE}) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tables=["supplier", "lineitem"],
    doc="top supplier (single-pass windowed max over exact decimals; "
        "Spark re-evaluates a twice-referenced CTE, so the scalar-"
        "subquery form scanned lineitem twice)",
)

sql_query(
    "tpch_q16",
    """
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#1'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tables=["lineitem", "part"],
    doc="parts/supplier relationship (count distinct; partsupp-free analogue)",
)

sql_query(
    "tpch_q17",
    # the correlated per-partkey average only matters for Brand#3
    # partkeys, and joining part (1 row/partkey) duplicates nothing —
    # so a PARTITION BY l_partkey window over the brand-filtered join
    # computes threshold and qualifying rows in one pass, replacing
    # Spark's decorrelated full-lineitem aggregate (600k-row shuffle)
    # with a ~1/25-size one (−46% interleaved at sf0.1). Oracle keeps
    # the canonical correlated form.
    f"""
    SELECT CAST(SUM(pd) AS DOUBLE) / 7.0 AS avg_yearly
    FROM (
        SELECT {dec('l_extendedprice')} AS pd, l_quantity,
               0.2 * (CAST(SUM({dec('l_quantity')}) OVER (PARTITION BY l_partkey) AS DOUBLE)
                      / COUNT(*) OVER (PARTITION BY l_partkey)) AS thr
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#3'
    )
    WHERE l_quantity < thr
    """,
    oracle=f"""
    SELECT CAST(SUM({dec('l_extendedprice')}) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#3'
      AND l_quantity < (
          SELECT 0.2 * (CAST(SUM({dec('l_quantity')}) AS DOUBLE) / COUNT(*))
          FROM lineitem l2
          WHERE l2.l_partkey = p_partkey
      )
    """,
    tables=["lineitem", "part"],
    doc="small-quantity-order revenue (windowed per-part threshold, deterministic avg)",
)

sql_query(
    "tpch_q18",
    f"""
    WITH big AS (
        SELECT l_orderkey, SUM({dec('l_quantity')}) AS sq
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM({dec('l_quantity')}) > 150
    )
    SELECT
        c_name, c_custkey, o_orderkey,
        CAST(o_orderdate AS DATE) AS o_orderdate,
        o_totalprice,
        CAST(b.sq AS DOUBLE) AS sum_qty
    FROM big b, orders, customer
    WHERE o_orderkey = b.l_orderkey
      AND c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    oracle=f"""
    SELECT
        c_name, c_custkey, o_orderkey,
        CAST(o_orderdate AS DATE) AS o_orderdate,
        o_totalprice,
        CAST(SUM({dec('l_quantity')}) AS DOUBLE) AS sum_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM({dec('l_quantity')}) > 150
    )
      AND c_custkey = o_custkey
      AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tables=["customer", "orders", "lineitem"],
    doc="large volume customer — the final per-order GROUP BY equals the "
        "HAVING aggregate, so lineitem is scanned/aggregated ONCE and the "
        "big-order keys join straight to orders/customer; the oracle keeps "
        "the textbook IN-subquery form so the gate proves the rewrite",
)

sql_query(
    "tpch_q19",
    f"""
    SELECT CAST(SUM({DISC_PRICE}) AS DOUBLE) AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#1' AND l_quantity >= 1 AND l_quantity <= 11 AND p_size BETWEEN 1 AND 5)
        OR (p_brand = 'Brand#2' AND l_quantity >= 10 AND l_quantity <= 20 AND p_size BETWEEN 1 AND 10)
        OR (p_brand = 'Brand#3' AND l_quantity >= 20 AND l_quantity <= 30 AND p_size BETWEEN 1 AND 15))
    """,
    tables=["lineitem", "part"],
    doc="discounted revenue (disjunctive pushdown)",
)

sql_query(
    "tpch_q20",
    f"""
    SELECT s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND p_name LIKE 'red%'
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING SUM({dec('l_quantity')}) > 100
    )
    ORDER BY s_name
    """,
    tables=["supplier", "lineitem", "part"],
    doc="potential part promotion (nested semi-join)",
)

sql_query(
    "tpch_q21",
    """
    WITH late AS (
        SELECT l_orderkey, l_suppkey
        FROM lineitem, orders
        WHERE o_orderkey = l_orderkey
          AND o_orderstatus = 'F'
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    ),
    lateagg AS (
        SELECT l_orderkey, MIN(l_suppkey) AS mn, MAX(l_suppkey) AS mx,
               COUNT(*) AS cnt
        FROM late GROUP BY l_orderkey
    ),
    ordstats AS (
        SELECT l_orderkey, MIN(l_suppkey) AS mn, MAX(l_suppkey) AS mx
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT s_name, CAST(SUM(la.cnt) AS BIGINT) AS numwait
    FROM lateagg la, ordstats os, supplier, nation
    WHERE os.l_orderkey = la.l_orderkey AND os.mn <> os.mx
      AND la.mn = la.mx
      AND s_suppkey = la.mn
      AND s_nationkey = n_nationkey
      AND n_name = 'NATION_1'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
          SELECT * FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT * FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
      AND s_nationkey = n_nationkey
      AND n_name = 'NATION_1'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    doc="suppliers who kept orders waiting — EXISTS becomes min<>max and "
        "NOT-EXISTS-other-late becomes min=max over per-order supplier "
        "bounds (plain hash aggs, no COUNT DISTINCT expand); the late "
        "CTE is referenced ONCE (its aggregate carries the per-order "
        "late-row count, so numwait = SUM(cnt)) — Spark re-plans every "
        "CTE reference, and the old l1 x latestats self-reference "
        "recomputed the lineitem-orders join and row-level SMJ; the "
        "oracle keeps the textbook EXISTS/NOT EXISTS form so the gate "
        "proves the rewrite",
)

sql_query(
    "tpch_q22",
    # the global-average threshold is a one-row scalar aggregate over
    # the segment-filtered customers, broadcast-cross-joined back. The
    # round-5 empty-frame `OVER ()` form scanned customer once but
    # Spark plans that window as "move ALL (billions of) base rows to
    # ONE partition" — the worst single-task serialization in the
    # suite at scale. Two parallel scans of a dimension-sized table
    # beat one single-partition shuffle of it at any SF; DECIMAL sums
    # keep the threshold bit-identical to the oracle's two-pass form.
    """
    SELECT
        c_mktsegment,
        COUNT(*) AS numcust,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal
        FROM customer
        WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
    ) c, (
        SELECT CAST(SUM(CASE WHEN c_acctbal > 0.00
                             THEN CAST(c_acctbal AS DECIMAL(12,2)) END) AS DOUBLE)
               / SUM(CASE WHEN c_acctbal > 0.00 THEN 1 ELSE 0 END) AS avg_bal
        FROM customer
        WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
    ) t
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    oracle="""
    SELECT
        c_mktsegment,
        COUNT(*) AS numcust,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
      AND c_acctbal > (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
          FROM customer
          WHERE c_acctbal > 0.00
            AND c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
      )
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tables=["customer", "orders"],
    doc="global sales opportunity (anti-join + scalar subquery); the "
        "anti-join keeps customers with no LARGE order — in the synthetic "
        "data every customer has at least one order, so the literal TPC-H "
        "no-orders predicate would be vacuously empty at every SF",
)
