"""Event-time windowed aggregation — usable identically in batch and
streaming (the functions build plain column expressions; feed them a
``readStream`` DataFrame with ``with_watermark`` for late-data-safe
streaming state eviction).

None of this exists in the reference (row-at-a-time ETL, no event
time). Semantics follow Spark's windowing: tumbling = fixed buckets,
sliding = overlapping buckets (one output row per covering window),
session = gap-based merging windows.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """Late-data bound for streaming state eviction; no-op semantics in
    batch mode (Spark ignores watermarks on batch DataFrames)."""
    return df.withWatermark(ts_col, delay)


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str],
    aggs: dict[str, Column],
) -> DataFrame:
    """Fixed non-overlapping event-time buckets. Output carries
    window_start/window_end plus the group keys — the shuffle is on
    (window, keys), partial aggregation map-side as usual."""
    w = F.window(F.col(ts_col), duration)
    out = df.groupBy(w.alias("w"), *keys).agg(*[c.alias(n) for n, c in aggs.items()])
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *keys,
        *aggs.keys(),
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: Sequence[str],
    aggs: dict[str, Column],
) -> DataFrame:
    """Overlapping windows: each event contributes to
    duration/slide windows."""
    w = F.window(F.col(ts_col), duration, slide)
    out = df.groupBy(w.alias("w"), *keys).agg(*[c.alias(n) for n, c in aggs.items()])
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *keys,
        *aggs.keys(),
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str],
    aggs: dict[str, Column],
) -> DataFrame:
    """Gap-based session windows (merge while events are < gap apart).
    Streaming requires a watermark on ``ts_col`` first."""
    w = F.session_window(F.col(ts_col), gap)
    out = df.groupBy(w.alias("w"), *keys).agg(*[c.alias(n) for n, c in aggs.items()])
    return out.select(
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        *keys,
        *aggs.keys(),
    )
