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


# -- duplicate-cluster identification (connected components) ------------
# The dedup ACTION needs clusters, not pairs: every near-dup component
# collapses to one canonical doc (min doc_id). Edges are the verified
# 3-gram-Jaccard >= 0.4 pairs (dedup_ngram_jaccard); Spark runs
# Pregel-style min-label propagation to the fixpoint (O(diameter)
# rounds, each a shuffle on doc_id — the standard distributed CC; at
# 100 TB the edge set is LSH-candidate-sized, orders of magnitude
# smaller than the corpus, and the per-round driver touch is ONE
# scalar convergence count). The DuckDB oracle computes the same
# fixpoint as a recursive transitive closure.

def _dup_clusters_spark(spark, sf_dir):
    from pyspark.sql import functions as F

    from ducklake_spark.queries import load_tables
    from ducklake_spark.queries.dedup import _jaccard_sql

    load_tables(spark, sf_dir, ("documents",))
    pairs = spark.sql(_jaccard_sql("spark")).select("doc_a", "doc_b")
    edges = (
        pairs.union(pairs.select("doc_b", "doc_a")).toDF("src", "dst").cache()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .cache()
    )
    for _ in range(50):
        neigh = (
            edges.join(labels, edges["src"] == labels["id"])
            .groupBy(edges["dst"])
            .agg(F.min("label").alias("neigh_min"))
        )
        stepped = (
            labels.join(neigh, labels["id"] == neigh["dst"], "left")
            .select(
                labels["id"].alias("id"),
                F.least(
                    labels["label"],
                    F.coalesce(neigh["neigh_min"], labels["label"]),
                ).alias("label"),
            )
        )
        # pointer jump (label <- label's label): halves the remaining
        # chain length each round, so convergence takes O(log diameter)
        # rounds instead of O(diameter) — every label is itself a node
        # id, so the self-join always resolves
        jumped = (
            stepped.alias("a")
            .join(
                stepped.alias("b"),
                F.col("a.label") == F.col("b.id"),
                "left",
            )
            .select(
                F.col("a.id").alias("id"),
                F.least(
                    F.col("a.label"),
                    F.coalesce(F.col("b.label"), F.col("a.label")),
                ).alias("new_label"),
            )
        )
        # localCheckpoint truncates the per-round lineage (a cache-only
        # loop re-plans the whole join chain every iteration)
        new_labels = jumped.localCheckpoint(eager=True)
        changed = (  # labels only decrease: changed == strictly-lower
            new_labels.join(labels, "id")
            .filter(F.col("new_label") < F.col("label"))
            .count()
        )
        old = labels
        labels = new_labels.select(
            "id", F.col("new_label").alias("label")
        )
        old.unpersist()
        if changed == 0:
            break
    return (
        labels.groupBy("label")
        .agg(F.count("*").alias("cluster_size"))
        .select(F.col("label").alias("canonical_id"), "cluster_size")
        .orderBy(F.desc("cluster_size"), "canonical_id")
    )


def _dup_clusters_oracle() -> str:
    from ducklake_spark.queries.dedup import _jaccard_sql

    return f"""
    WITH RECURSIVE pairs AS (
        {_jaccard_sql("duckdb")}
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
    ),
    reach(id, root) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id
    ),
    comp AS (SELECT id, MIN(root) AS canonical_id FROM reach GROUP BY id)
    SELECT canonical_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
    FROM comp GROUP BY canonical_id
    ORDER BY cluster_size DESC, canonical_id
    """


from ducklake_spark.queries import df_query  # noqa: E402

df_query(
    "pp_dup_clusters",
    _dup_clusters_spark,
    oracle=_dup_clusters_oracle(),
    tables=["documents"],
    doc="near-dup clusters: connected components over verified Jaccard "
        "pairs via min-label propagation (Spark) vs recursive closure "
        "(oracle); canonical doc = min doc_id per component",
)


# -- Gopher repetition signal: top-bigram fraction ----------------------

def _top_bigram_sql(dialect: str) -> str:
    grams = (_spark_grams(2, distinct=False) if dialect == "spark"
             else _duck_grams(2, distinct=False))
    return f"""
    WITH {grams},
    cnt AS (
        SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g
    ),
    per_doc AS (
        SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n_bigrams
        FROM cnt GROUP BY doc_id
    )
    SELECT d.doc_id AS doc_id, d.source AS source,
           CAST(p.top_c AS BIGINT) AS top_c,
           CAST(p.n_bigrams AS BIGINT) AS n_bigrams,
           CAST(p.top_c AS DOUBLE) / p.n_bigrams AS top_bigram_frac
    FROM per_doc p JOIN documents d ON d.doc_id = p.doc_id
    ORDER BY top_bigram_frac DESC, doc_id
    LIMIT 50
    """


sql_query(
    "pp_top_bigram_frac",
    _top_bigram_sql("spark"),
    oracle=_top_bigram_sql("duckdb"),
    tables=["documents"],
    doc="Gopher repetition signal: fraction of a doc's bigrams taken by "
        "its most frequent bigram (hash aggs; one exact double division)",
)


# -- duplicated-window coverage per source ------------------------------
# Complements dedup_substring_spans (which LISTS repeated spans): the
# per-doc fraction of 8-token windows that appear in 2+ docs is the
# filterable signal, averaged per source with the integer-cent trick
# so the mean is association-order-exact across engines.

def _dup_coverage_sql(dialect: str) -> str:
    grams = (_spark_grams(8, distinct=False) if dialect == "spark"
             else _duck_grams(8, distinct=False))
    return f"""
    WITH {grams},
    dupg AS (
        SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    flag AS (
        SELECT gr.doc_id,
               CASE WHEN d.g IS NULL THEN 0 ELSE 1 END AS isdup
        FROM grams gr LEFT JOIN dupg d ON d.g = gr.g
    ),
    per_doc AS (
        SELECT doc_id, COUNT(*) AS n_w, SUM(isdup) AS n_dup
        FROM flag GROUP BY doc_id
    )
    SELECT d.source AS source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(CAST(ROUND(CAST(p.n_dup AS DOUBLE) / p.n_w
                                     * 10000) AS BIGINT)) AS DOUBLE)
                 / COUNT(*) / 10000, 4) AS avg_dup_window_frac
    FROM per_doc p JOIN documents d ON d.doc_id = p.doc_id
    GROUP BY d.source
    ORDER BY d.source
    """


sql_query(
    "pp_dup_window_coverage",
    _dup_coverage_sql("spark"),
    oracle=_dup_coverage_sql("duckdb"),
    tables=["documents"],
    doc="per-source mean fraction of 8-token windows duplicated across "
        "the corpus (explode + hash agg + equi-join, no all-pairs)",
)


# -- full curation funnel: one declarative pass -------------------------
# The end-to-end "what survives curation" query: Gopher rules + exact
# near-normalized dedup (keep min doc_id per normalized text) +
# majority-language gate, composed as ONE SQL statement — every stage
# is a hash aggregate or equi-join, so the whole funnel is a single
# Catalyst plan with map-side partials (no operator boundary
# materialization, no Python).

def _funnel_sql(dialect: str) -> str:
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
    ),
    canon AS (
        SELECT MIN(doc_id) AS doc_id
        FROM documents
        GROUP BY lower(regexp_replace(text, '\\\\s+', ' '))
    ),
    major AS (
        SELECT lang FROM (
            SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
        ) l ORDER BY n DESC, lang LIMIT 1
    ),
    flags AS (
        SELECT d.doc_id, d.source,
               CASE WHEN r.n_tokens BETWEEN 50 AND 100000
                     AND CAST(length(replace(d.text, ' ', '')) AS DOUBLE)
                         / r.n_tokens BETWEEN 3 AND 10
                     AND (d.text LIKE '% the %' OR d.text LIKE 'the %'
                          OR d.text LIKE '% a %' OR d.text LIKE 'a %')
                     AND r.top_token_frac <= 0.20
                    THEN 1 ELSE 0 END AS q_pass,
               CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END AS canon_pass,
               CASE WHEN d.lang = (SELECT lang FROM major)
                    THEN 1 ELSE 0 END AS lang_pass
        FROM documents d
        JOIN rep r ON r.doc_id = d.doc_id
        LEFT JOIN canon c ON c.doc_id = d.doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(q_pass) AS BIGINT) AS n_quality,
           CAST(SUM(canon_pass) AS BIGINT) AS n_canonical,
           CAST(SUM(lang_pass) AS BIGINT) AS n_major_lang,
           CAST(SUM(q_pass * canon_pass * lang_pass) AS BIGINT) AS n_kept
    FROM flags
    GROUP BY source
    ORDER BY source
    """


sql_query(
    "pp_curation_funnel",
    _funnel_sql("spark"),
    oracle=_funnel_sql("duckdb"),
    tables=["documents"],
    doc="end-to-end curation funnel per source: Gopher rules x exact "
        "dedup canonicals x majority-language gate in ONE declarative "
        "plan (hash aggs + equi-joins only)",
)


# --- sliding-window chunking ----------------------------------------------
# The standard "split documents into overlapping token windows" step of
# a pre-training pipeline (window 64, stride 48 => 16-token overlap;
# tail windows under 8 tokens are dropped). Pure explode + slice: the
# chunk relation shuffles on nothing — it is embarrassingly parallel
# per document, so at 100 TB it scales with the scan.

def _chunk_sql(dialect: str) -> str:
    if dialect == "spark":
        return """
WITH toks AS (SELECT doc_id, split(text, ' ') AS t FROM documents),
starts AS (
    SELECT doc_id, t,
           explode(sequence(0,
               CASE WHEN size(t) <= 64 THEN 0
                    ELSE CAST(ceil((size(t) - 64) / 48.0) AS INT) END)
           ) AS chunk_idx
    FROM toks
),
chunks AS (
    SELECT doc_id, chunk_idx, slice(t, chunk_idx * 48 + 1, 64) AS w
    FROM starts
)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(size(w) AS BIGINT) AS n_tok,
       element_at(w, 1) AS head_tok
FROM chunks WHERE size(w) >= 8
ORDER BY doc_id, chunk_idx
"""
    return """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
starts AS (
    SELECT doc_id, t,
           unnest(range(0,
               CASE WHEN len(t) <= 64 THEN 1
                    ELSE CAST(ceil((len(t) - 64) / 48.0) AS INT) + 1 END)
           ) AS chunk_idx
    FROM toks
),
chunks AS (
    SELECT doc_id, chunk_idx,
           t[chunk_idx * 48 + 1 : chunk_idx * 48 + 64] AS w
    FROM starts
)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(len(w) AS BIGINT) AS n_tok,
       w[1] AS head_tok
FROM chunks WHERE len(w) >= 8
ORDER BY doc_id, chunk_idx
"""


sql_query(
    "pp_chunk_windows",
    _chunk_sql("spark"),
    oracle=_chunk_sql("duckdb"),
    tables=["documents"],
    doc="sliding-window chunking (64-token windows, stride 48, short "
        "tails dropped) — per-document explode, no shuffle",
)
