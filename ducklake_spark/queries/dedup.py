"""Deduplication operators over the ``documents`` table.

Scale design: every variant is a pure DataFrame/SQL pipeline —
shingling explodes to a (doc_id, shingle) relation that Spark
shuffles by shingle/band hash, so 100 TB of documents parallelizes by
key with no driver-side state. MinHash signatures use md5 (available
and bit-identical in both Spark and DuckDB), with per-band seeds and
the numeric min of the 60-bit md5 prefix as the min-hash —
engine-portable determinism without custom hash UDFs.

- exact dedup: hash-groupBy on content digest.
- MinHash+LSH: shingle -> per-band min(md5(shingle||seed)) -> band
  bucket join -> candidate pairs.
- n-gram Jaccard: exact verification of LSH candidate pairs.
"""

from __future__ import annotations

from ducklake_spark.queries import sql_query

N_BANDS = 8

sql_query(
    "dedup_exact",
    """
    SELECT
        md5(text) AS content_hash,
        COUNT(*) AS n_copies,
        MIN(doc_id) AS keeper_doc_id
    FROM documents
    GROUP BY md5(text)
    HAVING COUNT(*) >= 1
    ORDER BY content_hash
    """,
    tables=["documents"],
    doc="exact dedup via content-hash groupBy (keeper = min doc_id)",
)

sql_query(
    "dedup_exact_normalized",
    """
    WITH normed AS (
        SELECT doc_id, md5(lower(trim(replace(text, '  ', ' ')))) AS h
        FROM documents
    )
    SELECT h AS content_hash, COUNT(*) AS n_copies, MIN(doc_id) AS keeper_doc_id
    FROM normed
    GROUP BY h
    ORDER BY content_hash
    """,
    tables=["documents"],
    doc="exact dedup after whitespace/case normalization",
)

# --- MinHash + LSH -------------------------------------------------------
# Spark dialect: split/transform/sequence + explode.
# DuckDB dialect: string_split/list_transform/range + unnest.
# Both feed md5-based band signatures; signature equality is the bucket key.

_SPARK_SHINGLES = """
    toks AS (
        SELECT doc_id, split(text, ' ') AS t FROM documents
    ),
    shingles AS (
        SELECT DISTINCT doc_id, shingle
        FROM (
            SELECT doc_id,
                   explode(transform(sequence(0, size(t) - 3),
                                     i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS shingle
            FROM toks
            WHERE size(t) >= 3
        ) s
    )
"""

_DUCK_SHINGLES = """
    toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    shingles AS (
        SELECT DISTINCT doc_id, shingle
        FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(t) - 1),
                                         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
            FROM toks
            WHERE len(t) >= 3
        ) s
    )
"""

_SPARK_BANDS = "bands AS (SELECT explode(sequence(0, {n})) AS band)"
_DUCK_BANDS = "bands AS (SELECT unnest(range(0, {n1})) AS band)"

# The per-band min-hash derives all bands from ONE md5 per shingle
# via Kirsch-Mitzenmacher double hashing: h1, h2 are the digest's two
# leading 32-bit words and band b's hash is (h1 + b*h2) mod P (largest
# 32-bit prime) — a standard universal family, so 1 md5 replaces the
# previous 2 (hashing dominates per-shingle cost). Numeric agg buffers
# keep Spark on HashAggregate (min(string) falls back to the slower
# SortAggregate). Spark converts hex with conv(), DuckDB with the '0x'
# cast; both yield the same integers, so the oracle matches bit-exact.

_MINHASH_P = 4294967291  # largest prime < 2^32


def _hashed_cte(dialect: str) -> str:
    if dialect == "spark":
        h1 = "CAST(conv(substring(md5(shingle), 1, 8), 16, 10) AS BIGINT)"
        h2 = "CAST(conv(substring(md5(shingle), 9, 8), 16, 10) AS BIGINT)"
    else:
        h1 = "CAST('0x' || substring(md5(shingle), 1, 8) AS BIGINT)"
        h2 = "CAST('0x' || substring(md5(shingle), 9, 8) AS BIGINT)"
    return f"""
    hashed AS (
        SELECT doc_id, {h1} AS h1, {h2} AS h2 FROM shingles
    )
"""


def _band_hash(band: str) -> str:
    return f"(h1 + CAST({band} AS BIGINT) * h2) % {_MINHASH_P}"


def _sig(dialect: str) -> str:
    return f"""
    {_hashed_cte(dialect)},
    sig AS (
        SELECT doc_id, band,
               MIN({_band_hash("band")}) AS minhash
        FROM hashed CROSS JOIN bands
        GROUP BY doc_id, band
    )
"""

# candidate pairs are a SET — no ORDER BY: the driver's oracle compare
# sorts rows before hashing, and the final sort of ~100k pairs cost a
# full extra exchange+stage (18% of the query, measured at sf0.1)
_PAIRS = """
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sig a
    JOIN sig b ON a.band = b.band AND a.minhash = b.minhash AND a.doc_id < b.doc_id
"""


# Spark fast path for the signature: MIN is insensitive to duplicate
# shingles, so the DISTINCT shuffle is dropped, and all 8 band
# minhashes are computed as agg columns in ONE grouped pass (map-side
# partial min -> the shuffle carries |docs| rows, not |shingles|x8),
# then unpivoted with stack(). Semantically identical to the banded
# form the oracle runs.
_SPARK_SHINGLES_DUP = """
    toks AS (
        SELECT doc_id, split(text, ' ') AS t FROM documents
    ),
    shingles AS (
        SELECT doc_id,
               explode(transform(sequence(0, size(t) - 3),
                                 i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS shingle
        FROM toks
        WHERE size(t) >= 3
    )
"""


def _spark_sig_wide() -> str:
    mins = ",\n               ".join(
        f"MIN({_band_hash(str(b))}) AS m{b}" for b in range(N_BANDS)
    )
    stack = ", ".join(f"{b}, m{b}" for b in range(N_BANDS))
    return f"""
    {_hashed_cte("spark")},
    sigw AS (
        SELECT doc_id,
               {mins}
        FROM hashed
        GROUP BY doc_id
    ),
    sig AS (
        SELECT doc_id, stack({N_BANDS}, {stack}) AS (band, minhash) FROM sigw
    )
"""


# A degenerate hot bucket (millions of identical docs sharing one
# (band, minhash)) would materialize O(|bucket|²) pairs — in ONE task
# for the Spark emitter below. Buckets above this size are dropped on
# BOTH engines (identical semantics, so the oracle still matches):
# docs that collide with thousands of others are already known
# near-duplicates; enumerating every pair adds no information, and at
# 100 TB it is the difference between finishing and an executor OOM.
# 1 000 bounds the per-task pair materialization at ~500k structs
# (round-5 verdict: the earlier 10k cap still admitted ~50M).
MAX_LSH_BUCKET = 1_000

# Spark pair generation: a sig self-join recomputes the whole shingle
# pipeline for the broadcast build side (no exchange reuse under a
# broadcast), doubling the query. Grouping each (band, minhash) bucket
# once and emitting in-bucket combinations from the sorted doc list
# computes sig exactly once — same pairs, one pass. The bucket size is
# counted by a window BEFORE collect_list so a degenerate bucket never
# builds its doc array at all (a post-hoc size(ds) filter would still
# collect millions of doc_ids into one aggregation buffer first); the
# window partitions by the bucket key — same hash distribution the
# groupBy needs, so the count adds no extra exchange — and computes
# only a count, which survives a pathological partition by spilling.
_SPARK_BUCKET_PAIRS = f"""
    sign AS (
        SELECT doc_id, band, minhash,
               COUNT(*) OVER (PARTITION BY band, minhash) AS n
        FROM sig
    ),
    buckets AS (
        SELECT array_sort(collect_list(doc_id)) AS ds
        FROM sign
        WHERE n BETWEEN 2 AND {MAX_LSH_BUCKET}
        GROUP BY band, minhash
    ),
    pairs AS (
        SELECT explode(flatten(transform(ds, (x, i) ->
                   transform(slice(ds, i + 2, size(ds)),
                             y -> named_struct('doc_a', x, 'doc_b', y))))) AS p
        FROM buckets
    )
    SELECT DISTINCT p.doc_a AS doc_a, p.doc_b AS doc_b
    FROM pairs
"""

# oracle twin of the cap: oversized buckets contribute no pairs
_DUCK_CAPPED_PAIRS = f"""
    bsize AS (
        SELECT band, minhash, COUNT(*) AS n
        FROM sig GROUP BY band, minhash
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sig a
    JOIN bsize z ON z.band = a.band AND z.minhash = a.minhash
                AND z.n BETWEEN 2 AND {MAX_LSH_BUCKET}
    JOIN sig b ON a.band = b.band AND a.minhash = b.minhash AND a.doc_id < b.doc_id
"""


def _minhash_sql(dialect: str) -> str:
    if dialect == "spark":
        return f"WITH {_SPARK_SHINGLES_DUP}, {_spark_sig_wide()}, {_SPARK_BUCKET_PAIRS}"
    bands = _DUCK_BANDS.format(n1=N_BANDS)
    return f"WITH {_DUCK_SHINGLES}, {bands}, {_sig('duckdb')}, {_DUCK_CAPPED_PAIRS}"


sql_query(
    "dedup_minhash_lsh",
    _minhash_sql("spark"),
    oracle=_minhash_sql("duckdb"),
    tables=["documents"],
    doc=f"MinHash+LSH near-dup candidates ({N_BANDS} md5-seeded bands over 3-token shingles)",
)


def _jaccard_sql(dialect: str) -> str:
    shingles = _SPARK_SHINGLES if dialect == "spark" else _DUCK_SHINGLES
    bands = (
        _SPARK_BANDS.format(n=N_BANDS - 1)
        if dialect == "spark"
        else _DUCK_BANDS.format(n1=N_BANDS)
    )
    return f"""
    WITH {shingles}, {bands}, {_sig(dialect)},
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sig a
        JOIN sig b ON a.band = b.band AND a.minhash = b.minhash AND a.doc_id < b.doc_id
    ),
    sizes AS (
        SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id
    ),
    inter AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
        FROM cand c
        JOIN shingles sa ON sa.doc_id = c.doc_a
        JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
        GROUP BY c.doc_a, c.doc_b
    )
    SELECT
        i.doc_a,
        i.doc_b,
        CAST(i.n_common AS DOUBLE) / (za.n + zb.n - i.n_common) AS jaccard
    FROM inter i
    JOIN sizes za ON za.doc_id = i.doc_a
    JOIN sizes zb ON zb.doc_id = i.doc_b
    WHERE CAST(i.n_common AS DOUBLE) / (za.n + zb.n - i.n_common) >= 0.4
    ORDER BY doc_a, doc_b
    """


sql_query(
    "dedup_ngram_jaccard",
    _jaccard_sql("spark"),
    oracle=_jaccard_sql("duckdb"),
    tables=["documents"],
    doc="exact 3-gram Jaccard verification of LSH candidate pairs (>= 0.4)",
)


# --- SimHash -------------------------------------------------------------
# 16-bit SimHash over distinct whitespace tokens: bit i's weight is the
# sum of ±1 contributions from bit i of md5(token); engine-portable via
# hex-digit arithmetic (instr/strpos on a hex alphabet — no bit ops that
# differ across dialects). Near-dup pairs use the 4-band pigeonhole:
# hamming(a,b) <= 3 guarantees at least one identical 4-bit band.

def _simhash_cte(dialect: str) -> str:
    if dialect == "spark":
        toks = ("SELECT DISTINCT doc_id, tok FROM (SELECT doc_id, "
                "explode(split(text, ' ')) AS tok FROM documents) t WHERE tok <> ''")
        bits = "SELECT explode(sequence(0, 15)) AS bit"
        idx = "instr('0123456789abcdef', substring(md5(tok), 1 + CAST(floor(bit / 4) AS INT), 1)) - 1"
    else:
        toks = ("SELECT DISTINCT doc_id, tok FROM (SELECT doc_id, "
                "unnest(string_split(text, ' ')) AS tok FROM documents) t WHERE tok <> ''")
        bits = "SELECT unnest(range(0, 16)) AS bit"
        idx = "strpos('0123456789abcdef', substring(md5(tok), 1 + CAST(floor(bit / 4) AS INT), 1)) - 1"
    return f"""
    toks AS ({toks}),
    bits AS ({bits}),
    contrib AS (
        SELECT doc_id, bit,
               SUM(CASE WHEN CAST(floor(({idx}) / pow(2, bit % 4)) AS INT) % 2 = 1
                        THEN 1 ELSE -1 END) AS w
        FROM toks CROSS JOIN bits
        GROUP BY doc_id, bit
    ),
    sh AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN w >= 0 THEN CAST(pow(2, bit) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
        FROM contrib
        GROUP BY doc_id
    )"""


def _simhash_sql(dialect: str) -> str:
    return f"WITH {_simhash_cte(dialect)} SELECT doc_id, simhash FROM sh ORDER BY doc_id"


sql_query(
    "dedup_simhash",
    _simhash_sql("spark"),
    oracle=_simhash_sql("duckdb"),
    tables=["documents"],
    doc="16-bit SimHash fingerprint per document (md5-derived bit weights)",
)


def _simhash_pairs_sql(dialect: str) -> str:
    return f"""
    WITH {_simhash_cte(dialect)},
    banded AS (
        SELECT doc_id, simhash, band,
               CAST(floor(simhash / pow(2, 4 * band)) AS BIGINT) % 16 AS band_val
        FROM sh CROSS JOIN (SELECT bit AS band FROM bits WHERE bit < 4) b
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a
    JOIN banded b ON a.band = b.band AND a.band_val = b.band_val
                 AND a.doc_id < b.doc_id
    WHERE {_hamming16(dialect)} <= 3
    ORDER BY doc_a, doc_b
    """


def _hamming16(dialect: str) -> str:
    # popcount(a XOR b) over 16 bits, written dialect-portably as a sum
    # of per-bit disagreements (pow/floor arithmetic only).
    terms = " + ".join(
        f"abs(CAST(floor(a.simhash / {1 << i}) AS BIGINT) % 2 - "
        f"CAST(floor(b.simhash / {1 << i}) AS BIGINT) % 2)"
        for i in range(16)
    )
    return f"({terms})"


def _simhash_pairs_spark_fast() -> str:
    """Spark-side rewrite of dedup_simhash_pairs, same rows (the
    oracle keeps the textbook banded self-join):

    - md5(tok) is computed ONCE per distinct token instead of once per
      (token, bit) — the 16-way bits cross join recomputed the digest
      16x per token;
    - the 16 per-bit weights become 16 SUM columns of ONE grouped pass
      (map-side partial agg; no 16x row explosion through the
      exchange), then fold into the fingerprint;
    - the hamming verify becomes bit_count(a XOR b) <= 3 — equal to
      the oracle's 16-term floor/pow sum for 16-bit fingerprints, one
      bit op per candidate pair instead of 32 floor-divisions (at
      sf0.1 the join verifies ~4M pairs);
    - the self-join takes a MERGE hint: a codegen'd sort-merge join
      enumerates in-bucket pairs ~2.7x faster than a collect_list +
      lambda emitter here (measured), and avoids broadcasting the
      fingerprint relation (which would replan the pipeline into the
      build side AND risk a driver OOM at corpus scale). Same
      unbounded pair semantics (this query has no bucket cap; the
      capped variant is dedup_minhash_lsh)."""
    # w_b: per-bit weight; digit d = b div 4 of the token digest,
    # identical arithmetic to _simhash_cte's contrib rows
    ws = ",\n               ".join(
        "SUM(CASE WHEN CAST(floor((instr('0123456789abcdef', "
        f"substring(h, {1 + b // 4}, 1)) - 1) / pow(2, {b % 4})) AS INT) "
        f"% 2 = 1 THEN 1 ELSE -1 END) AS w{b}"
        for b in range(16)
    )
    fp = " + ".join(
        f"CASE WHEN w{b} >= 0 THEN CAST(pow(2, {b}) AS BIGINT) ELSE 0 END"
        for b in range(16)
    )
    # hamming distance over the 16-bit fingerprints: the oracle's
    # per-bit floor/pow sum equals bit_count(a XOR b) for non-negative
    # ints < 2^16 — one bit op per pair instead of 16 floor-divisions,
    # and applied INSIDE the bucket lambda so non-surviving pairs are
    # never materialized, exploded, or shuffled into the DISTINCT
    return f"""
    WITH toks AS (
        SELECT DISTINCT doc_id, tok FROM (SELECT doc_id,
        explode(split(text, ' ')) AS tok FROM documents) t WHERE tok <> ''
    ),
    hx AS (
        SELECT doc_id, md5(tok) AS h FROM toks
    ),
    shw AS (
        SELECT doc_id,
               {ws}
        FROM hx
        GROUP BY doc_id
    ),
    sh AS (
        SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM shw
    ),
    banded AS (
        SELECT doc_id, simhash, band,
               CAST(floor(simhash / pow(2, 4 * band)) AS BIGINT) % 16 AS band_val
        FROM sh CROSS JOIN (SELECT explode(sequence(0, 3)) AS band) b
    )
    SELECT /*+ MERGE(a), MERGE(b) */ DISTINCT
           a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a
    JOIN banded b ON a.band = b.band AND a.band_val = b.band_val
                 AND a.doc_id < b.doc_id
    WHERE bit_count(a.simhash ^ b.simhash) <= 3
    ORDER BY doc_a, doc_b
    """


sql_query(
    "dedup_simhash_pairs",
    _simhash_pairs_spark_fast(),
    oracle=_simhash_pairs_sql("duckdb"),
    tables=["documents"],
    doc="SimHash near-dup pairs: 4-band LSH candidates, hamming <= 3 verify",
)
