"""Incremental aggregate maintenance (IVM) over the change data feed —
the BATCH twin of streaming/rollup.py's continuous aggregate: keep a
GROUP BY rollup of a rewriting keyed table current by folding only the
CHANGE ROWS of the commits since the last refresh, never re-scanning
the source.

Requires ``enable_cdf(preimages=True)`` on the source: updates then
emit an ``update_preimage`` row and deletes carry their full old
payload, so the SIGNED fold

    delta[g] = Σ (+row for insert/update) + Σ (−row for
               update_preimage/delete)

is exactly the change in COUNT(*)/SUM(x) per group g over any commit
range — order-independent (addition commutes), so one churn-sized
aggregation per refresh regardless of how many commits landed.

Scale shape at 100 TB: the delta aggregation reads only the staged
change files (churn-sized, already on disk — no join against the
source), map-side combines into at most |touched groups| rows, and the
fold into the rollup table is the same full-outer additive merge the
streaming twin uses — O(rollup), where the rollup cardinality is the
group count, orders below the source. The refresh marker
(``_IVM_APPLIED``) rides the rollup table's own commit via
``extra_files`` (atomic with the data, carried forward by maintenance
commits), so a re-run is a no-op and a crash can never desynchronize
marker and data — the streaming rollup's exactly-once design.

AVG and other ratios derive from (sum, count) pairs at read time;
MIN/MAX are NOT incrementally maintainable from deltas (a deleted
minimum needs the group's remaining rows) and are out of scope by
design — raise loudly, don't approximate.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from a2b_spark.storage.table import (
    CDF_DIR,
    LAYOUT_ONLY_OPS,
    VersionedParquetTable,
)

_IVM_APPLIED = "_IVM_APPLIED"

_ADD = ("insert", "update")
_SUB = ("update_preimage", "delete")


def change_rows(
    table: VersionedParquetTable,
    spark: SparkSession,
    from_version: int,
    to_version: Optional[int] = None,
) -> tuple[Optional[DataFrame], int]:
    """The staged change rows of commits ``(from_version,
    to_version]`` as ONE DataFrame (plus the resolved upper bound):
    a pure file read over the ``_cdf/`` dirs — no diff is derived.
    Layout-only commits are skipped; the INITIAL commit (version 1)
    streams its snapshot as inserts like the changes source; a content
    commit without change files raises (CDF was off when it was
    written); a vacuumed gap raises. Returns (None, to) when the range
    is empty."""
    to = to_version if to_version is not None else (
        table.current_version_number() or 0
    )
    if to <= from_version:
        return None, to
    retained = {
        VersionedParquetTable._parse_version_number(v): v
        for v in table.versions()
    }
    missing = [n for n in range(from_version + 1, to + 1) if n not in retained]
    if missing:
        raise ValueError(
            f"commits {missing} at {table.path} were vacuumed past the "
            "retention window; rebuild the rollup from scratch (or raise "
            "the source's retention / use vacuum(older_than=...))"
        )
    import json as _json

    frames = []
    for n in range(from_version + 1, to + 1):
        vdir = os.path.join(table.path, retained[n])
        info_p = os.path.join(vdir, "_COMMIT_INFO")
        op = None
        if os.path.exists(info_p):
            with open(info_p) as f:
                op = _json.loads(f.read()).get("op")
        if op in LAYOUT_ONLY_OPS:
            continue
        cdf_dir = os.path.join(vdir, CDF_DIR)
        if os.path.isdir(cdf_dir):
            frames.append(spark.read.parquet(cdf_dir))
            continue
        if n == 1:
            frames.append(
                table.read(spark, version=retained[n]).withColumn(
                    "change", F.lit("insert")
                )
            )
            continue
        raise ValueError(
            f"commit {retained[n]} at {table.path} has no change files "
            "(CDF was not enabled when it was written); rebuild the "
            "rollup starting at a later version"
        )
    if not frames:
        return None, to
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out, to


def rollup_delta(
    changes: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    count_alias: str = "n_rows",
) -> DataFrame:
    """The per-group (COUNT, SUMs) delta of a change-row frame: one
    churn-sized aggregation, +1/+x for after-images, −1/−x for
    pre-images and deletes. Groups whose rows all cancel drop out
    map-side only by luck — the zero-delta filter keeps the fold
    bounded by genuinely-touched groups."""
    sign = (
        F.when(F.col("change").isin(*_ADD), F.lit(1))
        .when(F.col("change").isin(*_SUB), F.lit(-1))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("unknown change type in CDF rows: "), F.col("change")
                )
            ).cast("int")
        )
    )
    aggs = [F.sum(sign).cast("long").alias(f"{count_alias}__delta")] + [
        F.sum(
            F.when(F.col(c).isNull(), F.lit(0)).otherwise(sign * F.col(c))
        ).alias(f"{c}__delta")
        for c in sum_cols
    ]
    d = changes.groupBy(*group_cols).agg(*aggs)
    nonzero = F.lit(False)
    for c in [f"{count_alias}__delta"] + [f"{c}__delta" for c in sum_cols]:
        nonzero = nonzero | (F.col(c) != 0)
    return d.filter(nonzero)


def refresh_rollup(
    rollup: VersionedParquetTable,
    source: VersionedParquetTable,
    spark: SparkSession,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    count_alias: str = "n_rows",
    sum_type: str = "decimal(28,6)",
) -> dict:
    """Bring ``rollup`` (= SELECT group_cols, COUNT(*) AS count_alias,
    SUM(c) FOR c IN sum_cols FROM source GROUP BY group_cols) up to
    the source's current version by folding only the change rows since
    the last applied version. First call (empty rollup) builds from
    the full snapshot; later calls are churn-sized. Groups whose count
    reaches zero are REMOVED (a group exists iff it has rows — the
    GROUP BY contract). Returns {"from_version", "to_version",
    "groups_touched"}.

    ``sum_type``: sums accumulate in an exact DECIMAL (engine-stable
    addition; the streaming rollup's discipline) — cast to double at
    read time if needed."""
    if not source.cdf_preimages():
        raise ValueError(
            f"refresh_rollup requires enable_cdf(preimages=True) on "
            f"{source.path}: without pre-images, update/delete deltas "
            "cannot decrement the rollup"
        )
    if tuple(rollup.key_cols) != tuple(group_cols):
        raise ValueError(
            f"rollup key_cols {rollup.key_cols} must equal group_cols "
            f"{tuple(group_cols)}"
        )
    cur = rollup.current_version()
    if cur is not None and os.path.exists(
        os.path.join(rollup.path, cur, "_LAST_BATCH")
    ):
        raise ValueError(
            f"rollup {rollup.path} is STREAM-maintained (streaming fold "
            "marker present); the two maintenance surfaces track "
            "different progress markers and mixing them double-counts — "
            "pick one"
        )
    applied = _read_applied(rollup)
    changes, to = change_rows(source, spark, applied)
    if changes is None:
        return {"from_version": applied, "to_version": to, "groups_touched": 0}
    add_cols = [count_alias] + list(sum_cols)
    delta = rollup_delta(changes, group_cols, sum_cols, count_alias)
    delta = delta.select(
        *group_cols,
        F.col(f"{count_alias}__delta").alias(count_alias),
        *[
            F.col(f"{c}__delta").cast(sum_type).alias(c)
            for c in sum_cols
        ],
    ).localCheckpoint(eager=True)  # consulted by count + fold + write
    groups_touched = delta.count()
    from a2b_spark.streaming.rollup import _additive_merge

    folded = _additive_merge(
        rollup.read(spark), delta, list(group_cols), add_cols
    ).filter(F.col(count_alias) > 0)
    rollup.overwrite(
        folded, op="ivm_refresh", extra_files={_IVM_APPLIED: str(to)}
    )
    return {
        "from_version": applied,
        "to_version": to,
        "groups_touched": groups_touched,
    }


def _read_applied(rollup: VersionedParquetTable) -> int:
    cur = rollup.current_version()
    if cur is None:
        return 0
    p = os.path.join(rollup.path, cur, _IVM_APPLIED)
    if not os.path.exists(p):
        return 0
    with open(p) as f:
        return int(f.read().strip() or 0)
