"""Training-data-pipeline operators: substring-span dedup, Gopher-style
quality rules, benchmark decontamination.

The three standard pre-training data-prep steps beyond near-dup/exact
dedup (SURVEY §2.8 "beyond reference" surface):

- repeated-span detection (the shape of exact substring dedup a la
  "Deduplicating Training Data Makes Language Models Better": long
  n-gram windows hashed and grouped — any window appearing in 2+ docs
  is a duplicated span);
- rule-based quality filtering (Gopher-style: word-count bounds, mean
  word length, stopword presence, max token-repetition fraction);
- test-set decontamination (13-gram overlap against a benchmark set —
  the industry-standard n for contamination checks).

Scale shape: every operator is an n-gram explode + hash aggregate /
equi-join — map-side partial aggregation, no all-pairs joins, no
Python in the hot path. At 100 TB the explode output shuffles on the
gram hash exactly like the MinHash pipeline (queries/dedup.py).
"""

from __future__ import annotations

from ducklake_spark.queries import sql_query


def _spark_grams(n: int, *, distinct: bool) -> str:
    d = "DISTINCT " if distinct else ""
    return f"""
    toks AS (
        SELECT doc_id, split(text, ' ') AS t FROM documents
    ),
    grams AS (
        SELECT {d}doc_id, g
        FROM (
            SELECT doc_id,
                   explode(transform(sequence(1, size(t) - {n} + 1),
                                     i -> concat_ws(' ', slice(t, i, {n})))) AS g
            FROM toks
            WHERE size(t) >= {n}
        ) s
    )
"""


def _duck_grams(n: int, *, distinct: bool) -> str:
    d = "DISTINCT " if distinct else ""
    return f"""
    toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    grams AS (
        SELECT {d}doc_id, g
        FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(t) - {n} + 2),
                                         i -> array_to_string(t[i:i+{n - 1}], ' '))) AS g
            FROM toks
            WHERE len(t) >= {n}
        ) s
    )
"""


# -- repeated-span detection (8-token windows) --------------------------

_SPAN_TAIL = """
    SELECT g AS span,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM grams
    GROUP BY g
    HAVING COUNT(DISTINCT doc_id) >= 2
    ORDER BY n_docs DESC, n_occurrences DESC, span
    LIMIT 100
"""

sql_query(
    "dedup_substring_spans",
    f"WITH {_spark_grams(8, distinct=False)} {_SPAN_TAIL}",
    oracle=f"WITH {_duck_grams(8, distinct=False)} {_SPAN_TAIL}",
    tables=["documents"],
    doc="exact substring dedup: 8-token spans repeated across documents "
        "(hash groupBy over exploded windows — the suffix-array result "
        "re-expressed as a distributed aggregate)",
)


# -- Gopher-style rule filter -------------------------------------------

def _gopher(dialect: str) -> str:
    if dialect == "spark":
        toks = "explode(split(text, ' ')) AS tok"
    else:
        toks = "unnest(string_split(text, ' ')) AS tok"
    return f"""
    WITH per_tok AS (
        SELECT doc_id, tok, COUNT(*) AS c
        FROM (SELECT doc_id, {toks} FROM documents) x
        GROUP BY doc_id, tok
    ),
    rep AS (
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_token_frac
        FROM per_tok GROUP BY doc_id
    )
    SELECT
        d.doc_id,
        r.n_tokens,
        CASE WHEN r.n_tokens BETWEEN 50 AND 100000 THEN 1 ELSE 0 END
            AS pass_word_count,
        CASE WHEN CAST(length(replace(d.text, ' ', '')) AS DOUBLE)
                  / r.n_tokens BETWEEN 3 AND 10 THEN 1 ELSE 0 END
            AS pass_word_len,
        CASE WHEN d.text LIKE '% the %' OR d.text LIKE 'the %'
              OR d.text LIKE '% a %' OR d.text LIKE 'a %'
             THEN 1 ELSE 0 END AS pass_stopwords,
        CASE WHEN r.top_token_frac <= 0.20 THEN 1 ELSE 0 END
            AS pass_repetition,
        CASE WHEN r.n_tokens BETWEEN 50 AND 100000
              AND CAST(length(replace(d.text, ' ', '')) AS DOUBLE)
                  / r.n_tokens BETWEEN 3 AND 10
              AND (d.text LIKE '% the %' OR d.text LIKE 'the %'
                   OR d.text LIKE '% a %' OR d.text LIKE 'a %')
              AND r.top_token_frac <= 0.20
             THEN 1 ELSE 0 END AS gopher_pass
    FROM documents d JOIN rep r ON r.doc_id = d.doc_id
    ORDER BY d.doc_id
"""


sql_query(
    "doc_gopher_quality",
    _gopher("spark"),
    oracle=_gopher("duckdb"),
    tables=["documents"],
    doc="Gopher-style rule filter: word-count bounds, mean word length, "
        "stopword presence, token-repetition fraction",
)


# -- 13-gram benchmark decontamination ----------------------------------

_DECON_TAIL = """
    , bench AS (
        SELECT DISTINCT g FROM grams WHERE doc_id % 10 = 0
    ),
    hits AS (
        SELECT t.doc_id, t.g
        FROM grams t JOIN bench b ON t.g = b.g
        WHERE t.doc_id % 10 <> 0
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_contaminated_grams
    FROM hits
    GROUP BY doc_id
    ORDER BY doc_id
"""

sql_query(
    "doc_decontaminate_13gram",
    f"WITH {_spark_grams(13, distinct=True)} {_DECON_TAIL}",
    oracle=f"WITH {_duck_grams(13, distinct=True)} {_DECON_TAIL}",
    tables=["documents"],
    doc="test-set decontamination: training docs sharing any 13-gram "
        "with the benchmark partition (equi-join on the gram, no "
        "all-pairs work)",
)
