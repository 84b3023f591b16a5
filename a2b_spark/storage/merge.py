"""Pure-DataFrame merge logic (the MERGE INTO expression layer).

Reference semantics (C5, SURVEY §2.3): write the transformed entity;
if the key was seen before, *update* the existing row, else *insert* —
NULL-safe key comparison (DataMigrationMapper.php:90-135, 394-401 →
``eqNullSafe``). Durability/atomicity live in
:mod:`a2b_spark.storage.table`; this module only builds the plan.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_dataframes(
    existing: DataFrame, batch: DataFrame, keys: Sequence[str], batch_wins: bool = True
) -> DataFrame:
    """Full-outer join on NULL-safe keys; batch columns win on match.

    Columns present on only one side pass through (schema union). No
    action is triggered — callers decide when/where to materialize.
    At scale this is one shuffle on the key columns; AQE converts to a
    broadcast join automatically when the batch is small.
    """
    e = existing.alias("e")
    b = batch.alias("b")
    cond = None
    for k in keys:
        c = F.col(f"e.{k}").eqNullSafe(F.col(f"b.{k}"))
        cond = c if cond is None else (cond & c)
    joined = e.join(b, on=cond, how="full_outer")
    out_cols = []
    e_cols, b_cols = set(existing.columns), set(batch.columns)
    for name in list(dict.fromkeys([*batch.columns, *existing.columns])):
        if name in e_cols and name in b_cols:
            pref, alt = ("b", "e") if batch_wins else ("e", "b")
            out_cols.append(F.coalesce(F.col(f"{pref}.{name}"), F.col(f"{alt}.{name}")).alias(name))
        elif name in b_cols:
            out_cols.append(F.col(f"b.{name}").alias(name))
        else:
            out_cols.append(F.col(f"e.{name}").alias(name))
    return joined.select(*out_cols)
