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


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    watermark: str,
    within: str,
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream equi-join with the event-time range
    bound Spark needs for state eviction: rows join when their keys
    match AND ``right_ts`` lies in [left_ts, left_ts + within].

    Both inputs get a ``watermark`` delay; with the range condition
    this bounds each side's join state to (watermark + within) of
    event time — without it an inner stream-stream join buffers both
    streams forever (the documented unbounded-state hazard). Works
    identically on batch frames (watermarks no-op, the condition is a
    plain filter), which is how the oracle-style tests cross-check the
    streamed result.

    ``how`` supports inner and leftOuter (outer emission waits for the
    watermark to pass, per Spark semantics)."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    keys = [lw[k] == rw[k] for k in on]
    rng = (rw[right_ts] >= lw[left_ts]) & (
        rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {within}")
    )
    cond = keys[0]
    for k in keys[1:]:
        cond = cond & k
    joined = lw.join(rw, cond & rng, how)
    # project unambiguous columns: left's keys survive, both timestamps
    dup = set(on)
    cols = [lw[c].alias(c) for c in left.columns] + [
        rw[c].alias(f"r_{c}" if c in dup or c in left.columns else c)
        for c in right.columns
    ]
    return joined.select(*cols)
