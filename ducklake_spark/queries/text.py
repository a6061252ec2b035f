"""Text-analysis operators over the ``documents`` table.

Training-data-pipeline text ops: token counting, quality scoring,
language ID (stopword-marker heuristic), document fingerprinting.
All are expressed with engine-portable string arithmetic
(length/replace) so the DuckDB oracle shares the SQL text — and, more
importantly for scale, so the whole computation stays JVM-side in
whole-stage codegen (no Python in the hot path).
"""

from __future__ import annotations

from ducklake_spark.queries import sql_query

# whitespace token count: separator-count + 1 (docs are single-spaced words)
N_TOKENS = "(length(text) - length(replace(text, ' ', '')) + 1)"


def occurrences(sub: str) -> str:
    """Count of substring occurrences via length arithmetic."""
    return f"(length(text) - length(replace(text, '{sub}', ''))) / {len(sub)}"


sql_query(
    "doc_token_stats",
    f"""
    SELECT
        lang,
        COUNT(*) AS n_docs,
        CAST(SUM({N_TOKENS}) AS BIGINT) AS total_tokens,
        CAST(SUM({N_TOKENS}) AS DOUBLE) / COUNT(*) AS avg_tokens,
        CAST(SUM(length(text)) AS BIGINT) AS total_chars,
        CAST(MAX({N_TOKENS}) AS BIGINT) AS max_tokens
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    tables=["documents"],
    doc="token counting per language (whitespace tokenizer, JVM-side)",
)

sql_query(
    "doc_quality_score",
    f"""
    SELECT
        doc_id,
        CAST({N_TOKENS} AS BIGINT) AS n_tokens,
        CAST(length(replace(text, ' ', '')) AS DOUBLE) / {N_TOKENS} AS avg_word_len,
        CAST({occurrences("the")} AS DOUBLE) / {N_TOKENS} AS stopword_ratio,
        CASE
            WHEN {N_TOKENS} >= 20
             AND CAST(length(replace(text, ' ', '')) AS DOUBLE) / {N_TOKENS} BETWEEN 3 AND 10
            THEN 1 ELSE 0
        END AS quality_pass
    FROM documents
    ORDER BY doc_id
    """,
    tables=["documents"],
    doc="quality scoring: length/stopword/word-shape heuristics",
)

# Language-ID: score each candidate language by marker-token hit count,
# take the argmax (ties broken by fixed language priority order).
_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "es": ["el", "los", "que"],
    "fr": ["le", "les", "est"],
    "zh": ["de", "shi", "le"],
}


def _lang_score(lang: str) -> str:
    padded = "(' ' || text || ' ')"
    parts = [
        f"(length({padded}) - length(replace({padded}, ' {m} ', ' '))) / {len(m) + 1}"
        for m in _MARKERS[lang]
    ]
    return "(" + " + ".join(parts) + ")"


_SCORES = ", ".join(f"{_lang_score(lg)} AS score_{lg}" for lg in ["en", "de", "es", "fr"])

sql_query(
    "doc_lang_id",
    f"""
    WITH scored AS (
        SELECT doc_id, lang, {_SCORES}
        FROM documents
    )
    SELECT
        doc_id,
        lang,
        CASE
            WHEN score_en >= score_de AND score_en >= score_es AND score_en >= score_fr THEN 'en'
            WHEN score_de >= score_es AND score_de >= score_fr THEN 'de'
            WHEN score_es >= score_fr THEN 'es'
            ELSE 'fr'
        END AS predicted_lang
    FROM scored
    ORDER BY doc_id
    """,
    tables=["documents"],
    doc="language ID via stopword-marker scoring + argmax",
)

sql_query(
    "doc_fingerprint",
    """
    SELECT
        doc_id,
        md5(lower(replace(text, ' ', ''))) AS fingerprint,
        substr(md5(lower(replace(text, ' ', ''))), 1, 8) AS short_fp
    FROM documents
    ORDER BY doc_id
    """,
    tables=["documents"],
    doc="normalized-content fingerprint (md5 of squashed text)",
)

sql_query(
    "doc_source_profile",
    f"""
    SELECT
        source,
        lang,
        COUNT(*) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        CAST(SUM(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END) AS BIGINT) AS long_docs,
        CAST(SUM({N_TOKENS}) AS DOUBLE) / COUNT(*) AS avg_tokens
    FROM documents
    GROUP BY source, lang
    ORDER BY source, lang
    """,
    tables=["documents"],
    doc="per-source corpus profile",
)


def _ngram_freq_sql(dialect: str) -> str:
    from ducklake_spark.queries.dedup import _DUCK_SHINGLES, _SPARK_SHINGLES

    shingles = _SPARK_SHINGLES if dialect == "spark" else _DUCK_SHINGLES
    return f"""
    WITH {shingles}
    SELECT shingle AS trigram, COUNT(*) AS n_docs
    FROM shingles
    GROUP BY shingle
    HAVING COUNT(*) >= 3
    ORDER BY n_docs DESC, trigram
    LIMIT 50
    """


sql_query(
    "doc_ngram_freq",
    _ngram_freq_sql("spark"),
    oracle=_ngram_freq_sql("duckdb"),
    tables=["documents"],
    doc="top-50 corpus trigrams by document frequency (distinct per doc)",
)
