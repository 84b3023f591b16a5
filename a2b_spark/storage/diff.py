"""Cross-version diff report for versioned tables — which keys were
inserted, deleted, or updated between two retained versions.

The natural companion to incremental mode (``run_migration(
incremental=True)`` skips unchanged keys; this reports what DID
change) and to :meth:`VersionedParquetTable.history` (history says a
merge happened; the diff says what it touched). The reference has no
versioned storage at all — its destination is the live DB — so this
is beyond-reference surface, designed the way Delta's
``table_changes`` / CDF reads are consumed.

Shape: ONE full-outer join on the key columns between the two
version snapshots (both sides pruned to key + compared columns at
the scan), classifying each key:

- key only in ``v_to``   → ``insert``
- key only in ``v_from`` → ``delete``
- key in both, any compared column differing (null-safe) → ``update``
- identical rows are dropped (the overwhelming majority at 100 TB —
  the join's output is bounded by the churn, not the table).

At scale both snapshot scans read only key + compared columns
(column pruning), the join shuffles on the key like any merge, and
nothing is collected to the driver.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from a2b_spark.storage.table import VersionedParquetTable


def snapshot_diff(
    before: DataFrame,
    after: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Diff two keyed snapshots: (key cols..., change) with change in
    {'insert', 'delete', 'update'}; unchanged keys are omitted.
    ``compare_cols`` defaults to every shared non-key column.
    Column comparison is null-safe (NULL == NULL is unchanged)."""
    keys = list(key_cols)
    if compare_cols is None:
        shared = [c for c in before.columns if c in set(after.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    cmp_cols = list(compare_cols)

    def payload(alias: str):
        # zero compared columns is legal (pure key-presence diff):
        # a constant payload makes every matched key "unchanged"
        if not cmp_cols:
            return F.lit(0).alias(alias)
        return F.struct(*[F.col(c) for c in cmp_cols]).alias(alias)

    # NULL-SAFE key match, like merge_dataframes: the storage layer's
    # documented key semantics let a NULL key tuple exist (merge
    # upserts it in place); a plain `on=keys` join would never match
    # NULL=NULL and mis-report that unchanged row as delete+insert
    b = before.select(
        *[F.col(k).alias(f"__kb_{k}") for k in keys], payload("__b")
    )
    a = after.select(*[F.col(k).alias(f"__ka_{k}") for k in keys], payload("__a"))
    cond = None
    for k in keys:
        e = F.col(f"__kb_{k}").eqNullSafe(F.col(f"__ka_{k}"))
        cond = e if cond is None else (cond & e)
    j = b.join(a, cond, "full_outer")
    change = (
        F.when(F.col("__b").isNull(), F.lit("insert"))
        .when(F.col("__a").isNull(), F.lit("delete"))
        .when(~F.col("__b").eqNullSafe(F.col("__a")), F.lit("update"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"__kb_{k}"), F.col(f"__ka_{k}")).alias(k)
                for k in keys
            ],
            "change",
        )
    )


def version_diff(
    table: VersionedParquetTable,
    spark: SparkSession,
    v_from: Optional[str] = None,
    v_to: Optional[str] = None,
    compare_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Diff two retained versions of ``table`` (defaults: the previous
    retained version → the current one). Keys come from the table's
    own ``key_cols``; see :func:`snapshot_diff` for the output
    contract. Raises if a requested version is not retained or the
    table has fewer than two versions and none are named."""
    versions = table.versions()
    if v_to is None:
        v_to = table.current_version()
    elif v_to not in versions:
        raise ValueError(
            f"version {v_to!r} not retained at {table.path}; "
            f"available: {versions}"
        )
    if v_from is None:
        if len(versions) < 2:
            raise ValueError(
                f"table {table.path} has {len(versions)} retained "
                "version(s); pass v_from explicitly or write more history"
            )
        idx = versions.index(v_to)
        if idx == 0:
            # negative indexing would silently wrap to the NEWEST
            # version and diff backwards
            raise ValueError(
                f"{v_to!r} is the oldest retained version of "
                f"{table.path}; pass v_from explicitly"
            )
        v_from = versions[idx - 1]
    before = table.read(spark, version=v_from)
    after = table.read(spark, version=v_to)
    return snapshot_diff(before, after, table.key_cols, compare_cols)


def attach_after_image(d: DataFrame, after: DataFrame, key_cols) -> DataFrame:
    """Left-join the after-image payload onto a keyed diff. NULL-SAFE
    key match, mirroring snapshot_diff: the storage layer's key
    semantics allow a NULL key tuple, and a plain ``on=keys`` join
    would strip such a row's after-image. The diff already carries the
    reserved ``change`` / ``_commit_version`` columns — a table whose
    DATA columns reuse those names would yield ambiguous duplicate
    output columns, so raise loudly instead (round-8 advice)."""
    keys = list(key_cols)
    reserved = {"change", "_commit_version"} & set(after.columns)
    if reserved:
        raise ValueError(
            "table data columns collide with reserved CDF output columns "
            f"{sorted(reserved)}; rename them before requesting row payloads"
        )
    a = after.select(
        *[F.col(k).alias(f"__ra_{k}") for k in keys],
        *[c for c in after.columns if c not in set(keys)],
    )
    cond = None
    for k in keys:
        e = F.col(k).eqNullSafe(F.col(f"__ra_{k}"))
        cond = e if cond is None else (cond & e)
    return d.join(a, cond, "left").drop(*[f"__ra_{k}" for k in keys])


def align_to_after(before: DataFrame, after: DataFrame) -> DataFrame:
    """Project ``before`` to include every column of ``after``
    (missing columns null-fill, narrower types upcast) — the same
    widening read() gives old files after an ADD-COLUMN or
    TYPE-WIDENING evolution. Without the null-fill, snapshot_diff
    compares only SHARED columns and a commit that merely POPULATES
    the new column reports no change at all; without the cast, the
    payload-struct comparison across a widen boundary fails to resolve
    (struct<int> vs struct<bigint>). THE one alignment rule — batch
    table_changes, the streaming twin, and commit-time change
    derivation all use it."""
    have = {f.name: f.dataType for f in before.schema.fields}
    for f in after.schema.fields:
        if f.name not in have:
            before = before.withColumn(f.name, F.lit(None).cast(f.dataType))
        elif have[f.name] != f.dataType:
            before = before.withColumn(f.name, F.col(f.name).cast(f.dataType))
    return before


def keyed_changes(
    before: DataFrame, after: DataFrame, key_cols: Sequence[str],
    preimages: bool = False,
) -> DataFrame:
    """:func:`snapshot_diff` with after-image payload — the generic
    change-data frame written at commit time when a table has CDF
    enabled. ``before`` is aligned to ``after``'s columns (add-column
    evolution) and vice versa is unnecessary: a column only in
    ``before`` was dropped and by contract is no longer compared.
    Deletes carry NULL payloads. One full-outer join; output bounded
    by the commit's churn.

    ``preimages=True`` (``enable_cdf(preimages=True)`` tables): each
    update ALSO emits an ``update_preimage`` row carrying the OLD
    values, and deletes carry their full pre-image payload instead of
    NULL — the shape incremental aggregate maintenance needs to
    DECREMENT (storage/ivm.py): the signed fold Σ(+post −pre) over a
    commit range reproduces any SUM/COUNT delta without re-scanning
    the table."""
    keys = list(key_cols)
    aligned = align_to_after(before, after)
    d = snapshot_diff(aligned, after, keys)
    post = attach_after_image(d, after, keys)
    if not preimages:
        return post
    pre = attach_after_image(
        d.filter(F.col("change").isin("update", "delete")), aligned, keys
    ).withColumn(
        "change",
        F.when(F.col("change") == "update", F.lit("update_preimage")).otherwise(
            F.lit("delete")
        ),
    )
    return post.filter(F.col("change") != "delete").unionByName(pre)


def merge_changes(
    existing: DataFrame, batch: DataFrame, keys: Sequence[str],
    preimages: bool = False,
) -> DataFrame:
    """The change-data rows of ``merge_dataframes(existing, batch,
    keys)`` computed in ONE batch-sized left join (instead of a
    table-sized diff of the merged output): a batch row is an
    ``insert`` when its key is absent from ``existing``, an
    ``update`` when present and any batch column differs (null-safe;
    a column the batch adds counts as differing when non-null —
    exactly what :func:`snapshot_diff` reports over align-to-after
    frames), and unchanged rows are dropped. After-images match the
    merged row: batch values for batch columns, existing-only columns
    pass through (NULL for inserts). Pytest pins equivalence to
    ``keyed_changes(existing, merged)``.

    ``preimages=True``: each update additionally emits an
    ``update_preimage`` row with the OLD values (already present on
    the join's existing side — zero extra joins); see
    :func:`keyed_changes` for the contract."""
    key_set = set(keys)
    reserved = {"change", "_commit_version"} & (
        set(existing.columns) | set(batch.columns)
    )
    if reserved:
        raise ValueError(
            "table data columns collide with reserved CDF output columns "
            f"{sorted(reserved)}; rename them before enabling CDF"
        )
    e_payload = [c for c in existing.columns if c not in key_set]
    b_payload = [c for c in batch.columns if c not in key_set]
    e_only = [c for c in e_payload if c not in set(batch.columns)]
    e = existing.select(
        *[F.col(k).alias(f"__me_{k}") for k in keys],
        *[F.col(c).alias(f"__me_{c}") for c in e_payload],
        F.lit(True).alias("__me_present"),
    )
    b = batch.alias("b")
    cond = None
    for k in keys:
        c = F.col(f"b.{k}").eqNullSafe(F.col(f"__me_{k}"))
        cond = c if cond is None else (cond & c)
    j = b.join(e, cond, "left")
    diff_cond = F.lit(False)
    for c in b_payload:
        if c in set(existing.columns):
            diff_cond = diff_cond | ~F.col(f"b.{c}").eqNullSafe(F.col(f"__me_{c}"))
        else:  # batch-added column: existing side is NULL by alignment
            diff_cond = diff_cond | F.col(f"b.{c}").isNotNull()
    change = (
        F.when(F.col("__me_present").isNull(), F.lit("insert"))
        .when(diff_cond, F.lit("update"))
    )
    out_cols = (
        [F.col(f"b.{k}").alias(k) for k in keys]
        + [F.col(f"b.{c}").alias(c) for c in b_payload]
        + [F.col(f"__me_{c}").alias(c) for c in e_only]
    )
    classified = j.withColumn("change", change).filter(
        F.col("change").isNotNull()
    )
    post = classified.select(*out_cols, "change")
    if not preimages:
        return post
    existing_cols = set(existing.columns)
    pre_cols = (
        [F.col(f"b.{k}").alias(k) for k in keys]
        + [
            (
                F.col(f"__me_{c}")
                if c in existing_cols
                # batch-added column: NULL before this merge, typed
                # from the batch side
                else F.lit(None).cast(batch.schema[c].dataType)
            ).alias(c)
            for c in b_payload
        ]
        + [F.col(f"__me_{c}").alias(c) for c in e_only]
    )
    pre = (
        classified.filter(F.col("change") == "update")
        .select(*pre_cols, F.lit("update_preimage").alias("change"))
    )
    return post.unionByName(pre)


def null_safe_key_cond(keys: Sequence[str], left_alias: str, right_alias: str):
    """Fold the NULL-safE key-tuple match over ``keys`` across two
    frame aliases — THE key-match contract of merge/delete/append
    (NULL == NULL matches; a plain on=keys join would not)."""
    cond = None
    for k in keys:
        e = F.col(f"{left_alias}.{k}").eqNullSafe(F.col(f"{right_alias}.{k}"))
        cond = e if cond is None else (cond & e)
    return cond
