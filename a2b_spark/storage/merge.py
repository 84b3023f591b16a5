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
    """Full-outer join on NULL-safe keys; on a matched key the winning
    side's value is taken AS IS — including explicit NULLs — exactly
    like ``MERGE … WHEN MATCHED THEN UPDATE SET col = batch.col``.
    (A naive COALESCE(b.col, e.col) would silently resurrect the old
    value whenever an update nulls a field.) Presence flags, not key
    null-checks, detect the match so all-NULL key tuples still work
    under eqNullSafe.

    Columns present on only one side pass through (schema union). No
    action is triggered — callers decide when/where to materialize.
    At scale this is one shuffle on the key columns; AQE converts to a
    broadcast join automatically when the batch is small.
    """
    E_FLAG, B_FLAG = "__e_present__", "__b_present__"
    e = existing.withColumn(E_FLAG, F.lit(True)).alias("e")
    b = batch.withColumn(B_FLAG, F.lit(True)).alias("b")
    cond = None
    for k in keys:
        c = F.col(f"e.{k}").eqNullSafe(F.col(f"b.{k}"))
        cond = c if cond is None else (cond & c)
    joined = e.join(b, on=cond, how="full_outer")
    win, lose = ("b", "e") if batch_wins else ("e", "b")
    win_flag = B_FLAG if batch_wins else E_FLAG
    out_cols = []
    e_cols, b_cols = set(existing.columns), set(batch.columns)
    for name in list(dict.fromkeys([*batch.columns, *existing.columns])):
        if name in keys:
            out_cols.append(F.coalesce(F.col(f"b.{name}"), F.col(f"e.{name}")).alias(name))
        elif name in e_cols and name in b_cols:
            out_cols.append(
                F.when(F.col(f"{win}.{win_flag}").isNotNull(), F.col(f"{win}.{name}"))
                .otherwise(F.col(f"{lose}.{name}"))
                .alias(name)
            )
        elif name in b_cols:
            out_cols.append(F.col(f"b.{name}").alias(name))
        else:
            out_cols.append(F.col(f"e.{name}").alias(name))
    return joined.select(*out_cols)
