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


# --- round 5: corpus-statistics operators --------------------------------

_SPARK_TOKS = """
    toks AS (
        SELECT doc_id, source, tok
        FROM (SELECT doc_id, source, explode(split(text, ' ')) AS tok
              FROM documents) t
        WHERE tok <> ''
    )
"""

_DUCK_TOKS = """
    toks AS (
        SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ),
    toks_f AS (SELECT * FROM toks WHERE tok <> '')
"""


def _ttr_sql(dialect: str) -> str:
    toks = _SPARK_TOKS if dialect == "spark" else _DUCK_TOKS
    src = "toks" if dialect == "spark" else "toks_f"
    return f"""
    WITH {toks},
    per_doc AS (
        SELECT doc_id,
               COUNT(*) AS n_tokens,
               COUNT(DISTINCT tok) AS n_types
        FROM {src} GROUP BY doc_id
    ),
    d AS (SELECT doc_id, source FROM documents)
    SELECT d.source,
           COUNT(*) AS n_docs,
           CAST(SUM(p.n_types) AS DOUBLE) / SUM(p.n_tokens) AS type_token_ratio,
           MIN(p.n_types) AS min_types, MAX(p.n_types) AS max_types
    FROM per_doc p JOIN d ON d.doc_id = p.doc_id
    GROUP BY d.source
    ORDER BY d.source
    """


sql_query(
    "pp_type_token_ratio",
    _ttr_sql("spark"),
    oracle=_ttr_sql("duckdb"),
    tables=["documents"],
    doc="vocabulary richness (type/token ratio) per source — repetitive "
        "generator slop scores low; exact int sums so the double division "
        "is bit-deterministic",
)


def _tfidf_sql(dialect: str) -> str:
    toks = _SPARK_TOKS if dialect == "spark" else _DUCK_TOKS
    src = "toks" if dialect == "spark" else "toks_f"
    return f"""
    WITH {toks},
    tf AS (
        SELECT source, tok, COUNT(*) AS tf
        FROM {src} GROUP BY source, tok
    ),
    df AS (
        SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
    ),
    n AS (SELECT COUNT(DISTINCT source) AS n_src FROM documents),
    scored AS (
        SELECT tf.source, tf.tok,
               ROUND(tf.tf * LN(CAST(n.n_src AS DOUBLE) / df.df + 1.0), 6)
                   AS tfidf
        FROM tf JOIN df ON df.tok = tf.tok CROSS JOIN n
    ),
    ranked AS (
        SELECT source, tok, tfidf,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY tfidf DESC, tok) AS rn
        FROM scored
    )
    SELECT source, tok, tfidf FROM ranked WHERE rn <= 5
    ORDER BY source, tfidf DESC, tok
    """


sql_query(
    "pp_tfidf_top_terms",
    _tfidf_sql("spark"),
    oracle=_tfidf_sql("duckdb"),
    tables=["documents"],
    doc="top-5 tf-idf terms per source (two hash aggs + small window; "
        "the ln is rounded to 6 dp so both engines' libm agree)",
)


def _src_cosine_sql(dialect: str) -> str:
    toks = _SPARK_TOKS if dialect == "spark" else _DUCK_TOKS
    src = "toks" if dialect == "spark" else "toks_f"
    return f"""
    WITH {toks},
    tf AS (
        SELECT source, tok, COUNT(*) AS c
        FROM {src} GROUP BY source, tok
    ),
    norms AS (
        SELECT source, SUM(c * c) AS n2 FROM tf GROUP BY source
    ),
    dots AS (
        SELECT a.source AS src_a, b.source AS src_b, SUM(a.c * b.c) AS dot
        FROM tf a JOIN tf b ON a.tok = b.tok AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT d.src_a, d.src_b,
           CAST(d.dot AS DOUBLE) / (SQRT(CAST(na.n2 AS DOUBLE))
                                    * SQRT(CAST(nb.n2 AS DOUBLE))) AS cosine
    FROM dots d
    JOIN norms na ON na.source = d.src_a
    JOIN norms nb ON nb.source = d.src_b
    ORDER BY src_a, src_b
    """


sql_query(
    "pp_source_cosine",
    _src_cosine_sql("spark"),
    oracle=_src_cosine_sql("duckdb"),
    tables=["documents"],
    doc="pairwise source similarity: cosine over token-count vectors — "
        "the heavy work is one hash agg; the pair join runs on the tiny "
        "per-source vectors (exact int dot products, IEEE sqrt/div, so "
        "doubles match bit-for-bit)",
)


# -- round 6: curation operators ---------------------------------------
# Three more shapes a 100 TB training-data pipeline needs: reproducible
# subsampling, per-domain best-k selection, and a lexical-diversity
# (token-entropy) signal. All scale-safe: the sample is a stateless
# hash predicate (pushes to the scan, no shuffle), best-k is a window
# partitioned BY SOURCE (never a global single partition), and entropy
# is two hash aggregates over exploded tokens.

# deterministic Bernoulli sampling: a doc is in the 10% sample iff the
# leading 32 bits of md5(doc_id || text) fall in the band — the same
# doc always samples the same way on any engine, any cluster, any run
# (rand()-based sampling is irreproducible across retries/partitions)
_SAMPLE_SPARK = ("CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), "
                 "text)), 1, 8), 16, 10) AS BIGINT)")
_SAMPLE_DUCK = ("CAST('0x' || substring(md5(concat(CAST(doc_id AS VARCHAR), "
                "text)), 1, 8) AS BIGINT)")


def _sample_sql(h: str) -> str:
    return f"""
    SELECT source,
           COUNT(*) AS n_sampled,
           CAST(SUM(CAST(n_chars AS DECIMAL(18,0))) AS BIGINT) AS chars_sampled,
           MIN(doc_id) AS first_doc
    FROM documents
    WHERE {h} % 10 = 0
    GROUP BY source
    ORDER BY source
    """


sql_query(
    "pp_hash_sample",
    _sample_sql(_SAMPLE_SPARK),
    oracle=_sample_sql(_SAMPLE_DUCK),
    tables=["documents"],
    doc="reproducible 10% corpus subsample via md5-band Bernoulli "
        "predicate (no shuffle; same membership on every engine/run)",
)

sql_query(
    "pp_best_per_source",
    """
    SELECT source, doc_id, n_chars
    FROM (
        SELECT source, doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS rn
        FROM documents
    ) t
    WHERE rn <= 3
    ORDER BY source, n_chars DESC, doc_id
    """,
    tables=["documents"],
    doc="per-domain best-k curation: keep the 3 largest docs per source "
        "(window partitioned by source — parallel at any corpus size)",
)


def _entropy_sql(dialect: str) -> str:
    split = "split" if dialect == "spark" else "string_split"
    if dialect == "spark":
        toks = f"""
    toks AS (
        SELECT doc_id, source, explode({split}(text, ' ')) AS tok
        FROM documents
    )"""
    else:
        toks = f"""
    toks AS (
        SELECT doc_id, source, unnest({split}(text, ' ')) AS tok
        FROM documents
    )"""
    # H = ln(n) - SUM(c·ln c)/n; both engines sum the same finite set
    # of c·ln(c) doubles, and the per-doc ROUND(…, 4) swallows the
    # ~1e-13 association-order difference before the source average
    return f"""
    WITH {toks},
    tf AS (
        SELECT doc_id, source, tok, COUNT(*) AS c
        FROM toks GROUP BY doc_id, source, tok
    ),
    ent AS (
        SELECT doc_id, source,
               ROUND(LN(CAST(SUM(c) AS DOUBLE))
                     - SUM(CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE)))
                       / CAST(SUM(c) AS DOUBLE), 4) AS h
        FROM tf GROUP BY doc_id, source
    )
    SELECT source,
           COUNT(*) AS n_docs,
           ROUND(CAST(SUM(CAST(ROUND(h * 10000) AS BIGINT)) AS DOUBLE)
                 / COUNT(*) / 10000, 4) AS avg_entropy
    FROM ent
    GROUP BY source
    ORDER BY source
    """


sql_query(
    "pp_token_entropy",
    _entropy_sql("spark"),
    oracle=_entropy_sql("duckdb"),
    tables=["documents"],
    doc="lexical diversity: per-doc token-distribution entropy averaged "
        "per source (integer-cent sum makes the average order-exact)",
)
