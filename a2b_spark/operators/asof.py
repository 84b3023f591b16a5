"""As-of (point-in-time) join — for each left row, the latest right
row with the same key and right.ts <= left.ts.

Spark has no native ASOF JOIN (DuckDB does; Flink calls it a temporal
join). The scalable formulation is the union-and-window trick:

    union(left tagged side=1, right tagged side=0)
      -> window over (key) ordered by (ts, side, tiebreak)
      -> last(right payload, ignorenulls=True)
      -> keep side=1 rows

One shuffle on the key + one sort — same cost as a self-window, and
immune to the range-join blowup of the naive
``left.join(right, right.ts <= left.ts)`` + argmax formulation, whose
intermediate is O(|left| x matching right rows) and degenerates to a
cross join per key at 100 TB. Ordering puts right rows *before* left
rows at equal timestamps, so ties honour the <= contract; a final
deterministic tiebreak column keeps duplicate-timestamp right rows
stable across engines.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    right_cols: Sequence[str],
    right_tiebreak: Optional[str] = None,
    suffix: str = "_matched",
) -> DataFrame:
    """ASOF LEFT JOIN: every left row, plus ``right_cols`` from the
    latest right row at-or-before its ``ts_col`` with equal ``on`` keys
    (nulls when no prior right row exists).

    ``right_tiebreak``: column ordering duplicate-timestamp right rows
    (the greatest wins, matching "latest"); required for deterministic
    output when right timestamps can collide.

    NULL semantics match join-based ASOF (DuckDB ``ASOF JOIN``): right
    rows with a NULL key or NULL timestamp can never match and are
    dropped up front; left rows always survive (LEFT join) — a NULL
    key or NULL timestamp on the left simply yields NULL payload.
    Without the filter, the window's partitionBy would group NULL keys
    together and "match" them — a divergence, not a feature.
    """
    on = list(on)
    for c in [*on, ts_col]:
        right = right.filter(F.col(c).isNotNull())
    payload = F.struct(*[F.col(c) for c in right_cols]).alias("__asof")
    tb = (
        F.col(right_tiebreak)
        if right_tiebreak is not None
        else F.lit(0)
    )
    # keep the tiebreak's OWN type: a cast to long raises under ANSI
    # for non-numeric tiebreaks and truncates timestamps to whole
    # seconds (same-second updates then pick an arbitrary winner);
    # the window orders any orderable type natively
    tb_type = right.select(tb.alias("__tb")).schema["__tb"].dataType.simpleString()

    left_cols = left.columns
    l_tagged = left.select(
        *on,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(tb_type).alias("__tb"),
        F.struct(*[F.col(c) for c in left_cols]).alias("__row"),
        F.lit(None).cast(
            right.select(payload).schema["__asof"].dataType.simpleString()
        ).alias("__asof"),
    )
    r_tagged = right.select(
        *on,
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        tb.alias("__tb"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left_cols]).alias("__row"))
            .schema["__row"]
            .dataType.simpleString()
        ).alias("__row"),
        payload,
    )
    # right rows sort before left rows at equal ts (side 0 < 1): the
    # <= of the as-of contract; __tb orders same-ts right rows
    w = (
        W.partitionBy(*on)
        .orderBy(F.col("__ts"), F.col("__side"), F.col("__tb"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__m", F.last("__asof", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    out = matched.select(
        *[F.col(f"__row.{c}").alias(c) for c in left_cols],
        *[
            F.col(f"__m.{c}").alias(f"{c}{suffix}" if c in left_cols else c)
            for c in right_cols
        ],
    )
    return out
