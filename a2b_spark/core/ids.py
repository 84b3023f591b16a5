"""Key extraction, casting, and deterministic destination-id generation.

Reference semantics:
- id fields are typed int|string and cast exactly once at extraction
  (src/DataMigration/DataMigrationExecutor.php:340-356,
  src/Drivers/IdTypeConversionTrait.php:23-33);
- an unset id field is an error (MigrationException, executor :348-352);
- destination ids for *new* entities come from the sink (e.g. ORM
  autoincrement). In a distributed engine autoincrement is a
  bottleneck and ``monotonically_increasing_id`` is unstable across
  runs, so the default strategy is a 64-bit hash of the source id
  tuple + migration name — deterministic across runs AND partitions,
  which is what makes the persistent mapping table meaningful.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from a2b_spark.core.migration import IdField


def cast_ids(df: DataFrame, ids: Sequence[IdField], strict: bool = True) -> DataFrame:
    """Cast declared id columns in place (reference C2).

    ``strict`` adds a null guard: the reference raises when a source row
    lacks an id value. Done as a filter+count would double-scan, so we
    use a raise_error expression — evaluated inline, no extra pass.
    """
    missing = [f_.name for f_ in ids if f_.name not in df.columns]
    if missing:
        raise KeyError(f"source rows missing declared id field(s) {missing}")
    out = df
    for f_ in ids:
        col = F.col(f_.name).cast(f_.spark_type)
        if strict:
            col = F.when(
                col.isNull(),
                F.raise_error(F.lit(f"null/unset id field '{f_.name}'")).cast(f_.spark_type),
            ).otherwise(col)
        out = out.withColumn(f_.name, col)
    return out


def deterministic_dest_id(src_id_cols: Sequence[str], salt: str) -> Column:
    """Stable 64-bit destination id from the source key tuple.

    xxhash64 is a Catalyst built-in (JVM-side, codegen'd). Salted with
    the migration name so two migrations writing the same key space
    don't collide. Made non-negative to play nicely with systems that
    treat ids as unsigned.
    """
    h = F.xxhash64(F.lit(salt), *[F.col(c) for c in src_id_cols])
    return F.pmod(h, F.lit(2**62)).cast("bigint")


def sequence_dest_id(df: DataFrame, order_cols: Sequence[str], start: int = 1) -> DataFrame:
    """Alternative strategy: dense sequential ids (ORM-autoincrement
    analogue). Requires a global ordering — one extra shuffle — so only
    for sinks that demand dense ids. Deterministic given the ordering.
    """
    from pyspark.sql import Window

    w = Window.orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn("__seq_id", (F.row_number().over(w) + F.lit(start - 1)).cast("bigint"))
