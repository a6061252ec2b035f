"""Custom stateful streaming operators over the CDC feed.

The reference has no streaming engine (SURVEY §2.10); its incremental
surface ends at snapshots + CDC. On Spark, the change feed composes
with arbitrary keyed state via ``applyInPandasWithState`` — this
module ships the canonical one: cumulative per-key profiles that
survive across micro-batches (and restarts, via the checkpoint), so a
bronze table's insert stream can maintain, e.g., per-user counters at
100 TB scale with state sharded by key across executors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "key long, n_events long, total double, first_ts timestamp, last_ts timestamp"
STATE_SCHEMA = "n long, total double, first_ts long, last_ts long"


def running_profile(
    stream_df: DataFrame, *, key_col: str, ts_col: str, value_col: str
) -> DataFrame:
    """Cumulative per-key (count, sum, first/last event time), emitted
    every micro-batch in ``update`` mode. State is one tiny tuple per
    key — executor-sharded, no driver involvement."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total, first_us, last_us = (
            state.get if state.exists else (0, 0.0, None, None)
        )
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
            ts_us = (pdf[ts_col].astype("int64") // 1000).astype("int64")
            lo, hi = int(ts_us.min()), int(ts_us.max())
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
        state.update((n, total, first_us, last_us))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_events": [n],
                "total": [total],
                "first_ts": [pd.Timestamp(first_us * 1000)],
                "last_ts": [pd.Timestamp(last_us * 1000)],
            }
        )

    return (
        stream_df.selectExpr(
            f"{key_col} AS key", f"{ts_col} AS {ts_col}", f"{value_col} AS {value_col}"
        )
        .groupBy("key")
        .applyInPandasWithState(
            update,
            OUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def dedup_stream(
    stream_df: DataFrame,
    *,
    content_cols: list[str],
    ts_col: str | None = None,
    watermark: str = "10 minutes",
    normalize: bool = True,
) -> DataFrame:
    """Streaming exact dedup: only the FIRST occurrence of each content
    fingerprint survives across micro-batches — the incremental form of
    the batch ``dedup_exact`` operator, for bronze-layer ingest where
    the same document arrives again hours later.

    Stays entirely on built-in operators (no Python in the hot path):
    the fingerprint is ``md5`` over the (optionally whitespace/case
    normalized) content columns, and duplicate suppression is Spark's
    watermarked ``dropDuplicates`` — keyed state sharded by fingerprint
    across executors, expired by the event-time watermark so state is
    bounded by the dedup horizon, not the stream's lifetime. Without
    ``ts_col`` the state never expires (exact global dedup; bounded by
    distinct-fingerprint count)."""
    from pyspark.sql import functions as F

    parts = [
        F.lower(F.regexp_replace(F.col(c).cast("string"), r"\s+", " "))
        if normalize
        else F.col(c).cast("string")
        for c in content_cols
    ]
    out = stream_df.withColumn(
        "_fingerprint", F.md5(F.concat_ws("\x1f", *parts))
    )
    if ts_col is not None:
        out = out.withWatermark(ts_col, watermark)
        return out.dropDuplicatesWithinWatermark(["_fingerprint"])
    return out.dropDuplicates(["_fingerprint"])
