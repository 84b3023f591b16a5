"""Versioned Parquet table: MVCC-style snapshot isolation + atomic
commits on plain Parquet — a minimal stand-in for Delta/Iceberg.

Why: Spark reads lazily. A merge whose plan still references the
current table contents must not delete those files mid-job, and the
orphan anti-diff (executor C6) compares against the *pre-run* snapshot
after the destination has already been rewritten. Swapping files in
place (first attempt) breaks both. Versioning fixes it the same way
real table formats do:

    path/
      _CURRENT            ← text file naming the live version (atomic os.replace)
      v_0000000001/…parquet
      v_0000000002/…parquet

- Readers resolve ``_CURRENT`` once; the version dir they hold is
  immutable, so in-flight plans never lose files.
- Writers produce a whole new version dir, then flip ``_CURRENT``
  atomically. Concurrent readers see old-or-new, never a mix —
  the same all-or-nothing guarantee the reference gets from its
  tempfile+copy flush (CsvDestinationDriver.php:198-203).
- Partitioned merges rewrite ONLY touched partitions and hard-link
  the untouched partition files into the new version (metadata-only
  copy, the local-FS analogue of Iceberg manifest reuse). Cost is
  O(touched data + total file count), not O(table).
- ``vacuum`` trims old versions (default retention 3) at commit time.

On a real cluster this module is the seam where Delta/Iceberg slots
in; every caller goes through read()/merge()/overwrite()/delete_keys().
"""

from __future__ import annotations

import contextlib
import os
import shutil
import uuid
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from a2b_spark.storage.merge import merge_dataframes

CURRENT = "_CURRENT"
SCHEMA = "_SCHEMA"
COMMIT_INFO = "_COMMIT_INFO"
CONSTRAINTS = "_CONSTRAINTS"
# column names dropped by drop_columns() whose PHYSICAL data may still
# live in hardlinked files of this version — re-introducing such a name
# must force a full rewrite or the stale physical values would resurface
DROPPED = "_DROPPED"
# CDF (change data feed) versioned property marker + per-commit change
# files (Delta's delta.enableChangeDataFeed design: changes are WRITTEN
# at commit time so streams read files instead of re-deriving diffs)
CDF_ENABLED = "_CDF_ENABLED"
CDF_DIR = "_cdf"
# DELETION VECTORS (Delta DV analogue, key-list form): a version's
# ``_dv/`` parquet holds the key tuples logically deleted from its
# still-hardlinked data files; every read anti-joins it (broadcast —
# the set is capped). A small delete then commits METADATA-SIZED: all
# data files hardlink, only the key list is written. Any full rewrite
# (overwrite/compact/unpartitioned append) physically purges and
# clears the vector; a pruned merge re-introducing a tombstoned key
# rewrites that key's stats-matching files and drops it from the
# carried vector.
DV_DIR = "_dv"
DV_MAX_KEYS = 1 << 16  # beyond this, fall back to the rewrite path
# Per-commit list of the data files THIS commit freshly wrote (JSON,
# relative paths) — recorded before any hardlink step, so it is
# exactly the new bytes. The appends-stream planner reads it instead
# of diffing two full per-version file maps: a C-commit drain then
# costs O(total new files), not O(C²) sidecar entries (version n's
# _STATS lists all n files of history).
ADDED = "_ADDED"
# ops whose commits change layout/metadata but no row content
LAYOUT_ONLY_OPS = {
    "compact",
    "purge",  # deletion-vector purge: identical row content
    "add_constraint",
    "drop_constraint",
    "drop_columns",
    "widen_column",
    "enable_cdf",
    "disable_cdf",
}

# Delta-style TYPE WIDENING pairs whose parquet files Spark 4 reads
# directly under the wider schema (vectorized-reader upcast) — the
# widen commit can therefore be metadata-only, zero files rewritten
_WIDEN_OK = {
    ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
    ("smallint", "int"), ("smallint", "bigint"),
    ("int", "bigint"),
    ("float", "double"),
    ("tinyint", "double"), ("smallint", "double"), ("int", "double"),
}

# df.dtypes speaks simpleString names ('tinyint'/'smallint'/'int'/
# 'bigint') — NOT the type-class names ('byte'/'short'/'integer'/'long')


class ConstraintViolation(ValueError):
    """A write batch (or, for add_constraint, the existing table)
    contains rows that fail a CHECK constraint."""


_UNSET_BASE = object()


class ConcurrentWriteError(RuntimeError):
    """Another writer committed between this write's snapshot and its
    commit flip. The write is abandoned (its version dir is left as an
    uncommitted orphan for vacuum); retry re-reads the new current."""

# per-format reader/writer options (CSV mirrors the reference's
# header-row convention, CsvSourceDriver.php:39-72)
_FORMAT_OPTIONS: dict[str, dict[str, str]] = {
    "parquet": {},
    "orc": {},  # columnar alternative; schema-carrying like parquet
    "csv": {"header": "true"},
    "json": {},
}


@contextlib.contextmanager
def _stats_friendly_timestamps(spark: SparkSession):
    """Spark's default parquet timestamp encoding is INT96, which
    carries NO footer min/max statistics — it blinds the ``_STATS``
    file-skipping layer to every timestamp predicate. TIMESTAMP_MICROS
    is stats-capable and read identically by Spark/DuckDB/pyarrow. Set
    transiently around table writes (the driver harness builds its own
    session, so the table must not depend on caller conf), restore
    after."""
    key = "spark.sql.parquet.outputTimestampType"
    try:
        old = spark.conf.get(key)
    except Exception:
        old = None
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


class VersionedParquetTable:
    """Versioned keyed table; ``fmt`` selects the file format. Parquet
    is the scale path; csv/json exist for reference-parity sinks
    (CsvDestinationDriver) and interchange. Non-parquet formats persist
    their schema (``_SCHEMA``) at write time and re-apply it on read —
    type-stable round trips without inference drift."""

    def __init__(
        self,
        path: str,
        key_cols: Sequence[str],
        partition_by: Sequence[str] | None = None,
        retention: int = 3,
        fmt: str = "parquet",
        partitions_derived_from_keys: bool = False,
        deletion_vectors: bool = False,
    ):
        """``partitions_derived_from_keys``: caller's promise that every
        partition column is a PURE FUNCTION of the key columns (e.g. a
        hash bucket of the key). Then a key can never move between
        partitions, and merge may skip the current-table key-location
        scan that otherwise guards against stale-row duplication —
        restoring strictly O(touched) merges for bucket-partitioned
        stores (streaming history tables).

        ``deletion_vectors``: WRITE-side opt-in (Delta DV analogue) —
        small deletes on a parquet or ORC table (partitioned or not)
        commit as a metadata-sized tombstone key list instead of rewriting
        any data file or partition (see the ``DV_DIR`` note).
        Partitioned commits carry the vector; merge rewrites a
        re-introduced key's stale partition and trims it; append of a
        tombstoned key fails loudly (merge or purge first);
        ``purge_deleted`` rewrites only the partitions that hold
        tombstoned bytes. Read-side application is unconditional: any
        handle reading a version that carries a ``_dv/`` vector
        applies it, flag or not — correctness lives in the data, not
        the handle."""
        if fmt not in _FORMAT_OPTIONS:
            raise ValueError(f"unsupported table format {fmt!r}")
        self.path = path
        self.key_cols = tuple(key_cols)
        self.partition_by = tuple(partition_by) if partition_by else None
        self.retention = retention
        self.fmt = fmt
        self.partitions_derived_from_keys = partitions_derived_from_keys
        self.deletion_vectors = deletion_vectors

    # ------------------------------------------------------------- reads
    @staticmethod
    def _parse_version_number(name: str) -> int:
        """``v_{n:010d}`` → n. The ONLY place the version-name format
        is interpreted — ``current_version_number`` (which streaming
        epoch counters build on) and ``_next_version`` must never
        parse it independently, or a format change desyncs them."""
        return int(name.split("_")[1])

    def current_version(self) -> Optional[str]:
        marker = os.path.join(self.path, CURRENT)
        if not os.path.exists(marker):
            return None
        with open(marker) as f:
            name = f.read().strip()
        return name or None

    def exists(self) -> bool:
        return self.current_version() is not None

    def current_version_number(self) -> Optional[int]:
        """The committed version as a MONOTONE integer (None before the
        first commit). Unlike ``len(versions())`` this never plateaus
        under retention vacuuming, so it is safe to derive epoch-style
        counters from; it also keeps the version-name format private
        to this module."""
        v = self.current_version()
        return None if v is None else self._parse_version_number(v)

    def versions(self) -> list[str]:
        """Retained COMMITTED version names, oldest → newest. Every
        committed write is one entry until ``vacuum`` trims history —
        the retention window bounds how far ``read(version=...)`` time
        travel reaches (the same contract as Delta/Iceberg retention).

        Only dirs ≤ the ``_CURRENT`` marker count: a writer mid-commit
        (or one that crashed before the marker flip) leaves a
        newer-named dir that is NOT readable history — listing it
        would let time travel read a half-written version."""
        cur = self.current_version()
        if cur is None or not os.path.isdir(self.path):
            return []
        return sorted(
            d for d in os.listdir(self.path) if d.startswith("v_") and d <= cur
        )

    def earliest_streamable_version(self) -> int:
        """Oldest starting OFFSET a brand-new CDF stream can begin
        from without hitting a vacuumed gap — the operational question
        both stream consumers otherwise answer only by raising. Valid
        as the appends source's ``startingversion`` option and as
        ``TableChangesStream``'s ``start_version``.

        A stream starting at offset ``k`` delivers commits
        ``k+1 .. current``; each needs its own version dir retained
        AND its predecessor's (the diff base / hardlink-identity
        source) — except version 1, which diffs against the empty
        table by construction. So on a table whose oldest retained
        commit is ``r``, the answer is ``0`` when ``r <= 1`` (full
        history retained) and ``r`` otherwise.

        Retention/checkpoint contract: ``vacuum`` keeps the last
        ``retention`` commits, so a live stream's stored offset must
        never fall more than ``retention - 1`` commits behind the
        writer — size ``retention`` to cover the consumer's longest
        expected downtime, or restart from a fresh checkpoint at this
        offset (accepting that the vacuumed prefix is re-delivered as
        part of no diff at all — it is simply absent)."""
        nums = sorted(self._parse_version_number(v) for v in self.versions())
        if not nums:
            return 0
        # vacuum trims oldest-first so the retained set is contiguous,
        # but a hand-pruned dir could leave an interior gap: the
        # earliest safe start is then the first version AFTER the
        # last gap (its predecessor must be retained too).
        lo = nums[0]
        for a, b in zip(nums, nums[1:]):
            if b != a + 1:
                lo = b
        return 0 if lo <= 1 else lo

    @staticmethod
    def _has_data_files(vdir: str) -> bool:
        """True when the version dir holds any DATA file — ``_``/``.``
        prefixed files AND directories (``_cdf``) are metadata."""
        from a2b_spark.storage.stats import keep_data_dir

        for root, dirs, files in os.walk(vdir):
            dirs[:] = [d for d in dirs if keep_data_dir(d)]
            if any(not fn.startswith(("_", ".")) for fn in files):
                return True
        return False

    def _version_schema(self, v: str):
        """The version's authoritative schema from its ``_SCHEMA``
        sidecar (table-root sidecar as pre-round-5 back-compat), or
        None when neither exists. THE one place sidecar schema
        resolution lives — read(), read_pruned() and the empty-table
        branch all go through it."""
        import json as _json

        from pyspark.sql import types as T

        for schema_file in (
            os.path.join(self.path, v, SCHEMA),
            os.path.join(self.path, SCHEMA),
        ):
            if os.path.exists(schema_file):
                with open(schema_file) as f:
                    return T.StructType.fromJson(_json.loads(f.read()))
        return None

    def read(self, spark: SparkSession, version: Optional[str] = None) -> Optional[DataFrame]:
        """Read the live version, or a retained historical one (time
        travel) when ``version`` names an entry of ``versions()``."""
        df = self._read_nodv(spark, version)
        if df is None:
            return None
        v = version or self.current_version()
        return self._apply_dv(spark, df, os.path.join(self.path, v))

    def _read_nodv(
        self, spark: SparkSession, version: Optional[str] = None
    ) -> Optional[DataFrame]:
        """:meth:`read` WITHOUT the deletion-vector anti join — the
        PHYSICAL rows, tombstoned ones included. Internal: the
        vector-maintenance paths (partitioned purge, merge
        re-introduction) must locate where tombstoned bytes LIVE,
        which the filtered read by definition cannot show."""
        v = version or self.current_version()
        if v is None:
            return None
        if version is not None and version not in self.versions():
            raise ValueError(
                f"version {version!r} not retained at {self.path}; "
                f"available: {self.versions()}"
            )
        vdir = os.path.join(self.path, v)
        if not self._has_data_files(vdir):
            # a fully-deleted table: Spark writes NO data files for an
            # empty (especially partitioned) frame, so the version is
            # readable only through its schema sidecar
            schema = self._version_schema(v)
            if schema is not None:
                return spark.createDataFrame([], schema)
        reader = spark.read.format(self.fmt).options(**_FORMAT_OPTIONS[self.fmt])
        # The per-version sidecar is the AUTHORITATIVE schema of that
        # version — applied for every format, parquet included (the
        # Delta model: schema from the log, not the footers). This is
        # what makes ADD-COLUMN schema evolution work: a version whose
        # untouched partitions hard-link pre-evolution files reads
        # them with the widened schema (missing columns null-fill),
        # instead of taking whichever file's footer Spark samples
        # first. A parquet version with no sidecar at all falls back
        # to footer inference.
        schema = self._version_schema(v)
        if schema is not None:
            reader = reader.schema(schema)
        return reader.load(vdir)

    # -------------------------------------------------- deletion vectors
    def _dv_df(self, spark: SparkSession, version: str) -> Optional[DataFrame]:
        """The version's deletion-vector key list (None when it carries
        none), cast to the version's CURRENT key types so a vector
        written before a type widening still matches."""
        d = os.path.join(self.path, version, DV_DIR)
        if not os.path.isdir(d) or not self.key_cols:
            return None
        reader = spark.read
        try:
            # the vector is a parquet this class itself wrote: its
            # footer schema (one driver-side pyarrow read) given to the
            # reader explicitly skips Spark's schema-inference job —
            # one fewer action per DV consult. Any conversion surprise
            # falls back to inference, never to a wrong schema.
            import pyarrow.parquet as _pq
            from pyspark.sql.pandas.types import from_arrow_schema

            # _stage_dv writes exactly one parquet file; sorted() keeps
            # the pick deterministic if that ever changes
            fs = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
            if fs:
                reader = reader.schema(
                    from_arrow_schema(
                        _pq.read_schema(os.path.join(d, fs[0]))
                    )
                )
        except (ImportError, ValueError, TypeError, KeyError):
            # only the expected conversion/availability surprises fall
            # back to Spark's schema inference; a genuine I/O error
            # (corrupt vector file) must surface at read time below,
            # not be silently deferred by a blanket except
            pass
        dv = reader.parquet(d)
        schema = self._version_schema(version)
        if schema is not None:
            dv = dv.select(
                *[
                    F.col(k).cast(schema[k].dataType).alias(k)
                    for k in self.key_cols
                ]
            )
        return dv

    def _dv_count(self, version: str) -> int:
        """Row count of the version's deletion vector WITHOUT a Spark
        job: the vector is a local key-list parquet this class itself
        wrote, so the footer metadata answers exactly (the keys are
        distinct by the union-of-disjoint construction). Driver-side
        pyarrow, O(files) footer reads."""
        d = os.path.join(self.path, version, DV_DIR)
        if not os.path.isdir(d) or not self.key_cols:
            return 0
        import pyarrow.parquet as _pq

        return sum(
            _pq.ParquetFile(os.path.join(d, f)).metadata.num_rows
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    def _apply_dv(
        self,
        spark: SparkSession,
        df: DataFrame,
        vdir: str,
        dv: Optional[DataFrame] = _UNSET_BASE,
    ) -> DataFrame:
        """Anti-join the version's deletion vector onto a data read —
        a BROADCAST anti join (the vector is capped at DV_MAX_KEYS), so
        applying it costs one map-side pass, never a shuffle. ``dv``:
        pass the already-loaded vector frame (or None for "no vector")
        to skip re-reading ``_dv/`` — callers that consult the vector
        themselves (the pruned merge) otherwise pay a second footer
        read + plan round-trip per commit."""
        version = os.path.basename(vdir)
        if dv is _UNSET_BASE:
            dv = self._dv_df(spark, version)
        if dv is None:
            return df
        from a2b_spark.storage.diff import null_safe_key_cond

        return df.alias("__data").join(
            F.broadcast(dv.alias("__dv")),
            null_safe_key_cond(self.key_cols, "__data", "__dv"),
            "left_anti",
        )

    # ----------------------------------------------------- file skipping
    def _write_added_sidecar(self, tmp_target: str) -> None:
        """Record this commit's freshly-staged data files as the
        ``ADDED`` JSON list — MUST run before the hardlink step of the
        calling commit path (see the constant's note)."""
        import json as _json

        from a2b_spark.storage import stats as _stats

        with open(os.path.join(tmp_target, ADDED), "w") as f:
            f.write(_json.dumps(sorted(_stats._data_files(tmp_target))))

    def _write_stats_sidecar(self, tmp_target: str, base: Optional[str]) -> None:
        """Per-file min/max statistics (``_STATS``), parquet and ORC —
        written into the staging dir so it commits atomically with the
        data. Hardlinked (untouched-partition) files reuse the base
        version's entries by inode. New files pay a driver-side
        footer-only read: parquet via pyarrow, ORC via the JVM ORC
        reader (``stats.collect_orc_footer_stats`` — zero Spark jobs;
        the round-13 per-commit distributed harvest cost one job per
        commit, which doubled the ORC walk queries). Very large ORC
        commits (> MAX_FOOTER_HARVEST_FILES new files) or any footer
        surprise fall back to the one distributed aggregation
        (``stats.collect_file_stats_spark``). An ORC commit with no
        active SparkSession simply skips the sidecar: every reader
        treats a stats-less version as never-prunable."""
        if self.fmt not in ("parquet", "orc"):
            return
        from a2b_spark.storage import stats as _stats

        collector = None
        if self.fmt != "parquet":
            spark = SparkSession.getActiveSession()
            if spark is None:
                return
            fmt = self.fmt

            def collector(vdir, rels, _spark=spark, _fmt=fmt):
                if _fmt == "orc":
                    got = _stats.collect_orc_footer_stats(_spark, vdir, rels)
                    if got is not None:
                        return got
                return _stats.collect_file_stats_spark(_spark, vdir, rels, _fmt)

        base_dir = os.path.join(self.path, base) if base else None
        base_stats = _stats.load_stats(base_dir) if base_dir else None
        _stats.write_stats(
            tmp_target,
            _stats.build_version_stats(
                tmp_target, base_dir, base_stats, batch_collector=collector
            ),
        )

    def prune_files(
        self, predicates, version: Optional[str] = None
    ) -> tuple[list[str], int]:
        """Driver-side file skipping: data files of ``version`` whose
        stats may satisfy the conjunctive ``predicates`` (list of
        (col, op, value); op in =, <, <=, >, >=, between — between
        takes a (lo, hi) tuple). Returns (kept absolute paths, total
        file count). Files without usable stats are always kept;
        partition columns are not in file stats (Spark prunes them
        from the directory layout during the pruned read)."""
        from a2b_spark.storage import stats as _stats

        v = version or self.current_version()
        if v is None:
            return [], 0
        preds = _stats.normalize_predicates(predicates)
        vdir = os.path.join(self.path, v)
        s = _stats.load_stats_arrow(vdir)
        all_files = _stats._data_files(vdir)
        if s is None:  # pre-stats version: nothing can be skipped
            return [os.path.join(vdir, f) for f in all_files], len(all_files)
        # vectorized pyarrow.compute prune over the whole sidecar at
        # once: planning stays sub-second at 10⁵+ file entries, and
        # only the KEPT paths materialize as Python strings. A file
        # missing from the sidecar is always kept.
        kept = [
            os.path.join(vdir, f)
            for f in _stats.keep_files(s, all_files, preds)
        ]
        return kept, len(all_files)

    def read_pruned(
        self, spark: SparkSession, predicates, version: Optional[str] = None
    ) -> Optional[DataFrame]:
        """``read`` + file skipping: scan only the files whose stats
        may satisfy ``predicates``, then apply the SAME predicates as a
        real filter — exact results whether or not any file has stats,
        with the scan bounded by the driver-side prune (the
        data-skipping contract of Delta/Iceberg readers). Parquet and
        ORC; other formats fall back to a filtered full read."""
        from a2b_spark.storage import stats as _stats

        v = version or self.current_version()
        if v is None:
            return None
        preds = _stats.normalize_predicates(predicates)
        cond = _stats.predicates_to_column(preds)
        if self.fmt not in ("parquet", "orc"):
            full = self.read(spark, version=v)
            return None if full is None else full.filter(cond)
        # the filter evaluates timestamp literals in the SESSION
        # timezone while the sidecar stores naive UTC — re-express the
        # pruning literals so a non-UTC session can never skip a file
        # the filter would match. Schema from the sidecar (two stat
        # calls), NOT a full read(): a DataFrameReader.load here would
        # list the whole version dir before pruning even starts,
        # negating the sub-second planning win at 10^5 files.
        tz = spark.conf.get("spark.sql.session.timeZone", "UTC") or "UTC"
        sidecar_schema = self._version_schema(v)
        schema = sidecar_schema
        if schema is None:
            schema = self.read(spark, version=v).schema
        stat_preds = _stats.localize_ts_predicates(preds, schema, tz)
        kept, _total = self.prune_files(stat_preds, version=v)
        if not kept:
            base = self.read(spark, version=v)
            return None if base is None else base.filter(F.lit(False)).filter(cond)
        vdir = os.path.join(self.path, v)
        reader = (
            spark.read.format(self.fmt)
            .options(**_FORMAT_OPTIONS[self.fmt])
            .option("basePath", vdir)  # keep partition columns
        )
        # the version's sidecar schema (resolved once above), like
        # read(): kept files from before an add-column evolution
        # null-fill the new column instead of steering footer inference
        if sidecar_schema is not None:
            reader = reader.schema(sidecar_schema)
        return self._apply_dv(spark, reader.load(kept).filter(cond), vdir)

    # ------------------------------------------------------------ writes
    def _next_version(self) -> str:
        v = self.current_version()
        n = self._parse_version_number(v) + 1 if v else 1
        return f"v_{n:010d}"

    def _commit(self, version: str, base=_UNSET_BASE) -> None:
        """Flip ``_CURRENT`` to ``version``. ``base`` is the version
        this write DERIVED from (None for a fresh table): optimistic
        concurrency a la Delta — if another writer committed since,
        flipping would silently discard their rows, so raise instead
        and leave this write's dir as an uncommitted orphan (vacuum
        removes it). Detection, not prevention: a tiny TOCTOU window
        between the check and the rename remains — same-table writers
        should still be serialized (the pipeline runner serializes
        migrations sharing a mapping table); this check turns a silent
        lost update into a loud error."""
        os.makedirs(self.path, exist_ok=True)
        if base is not _UNSET_BASE:
            now = self.current_version()
            if now != base:
                raise ConcurrentWriteError(
                    f"{self.path}: base version {base!r} superseded by "
                    f"{now!r} during the write; retry against the new "
                    "current version"
                )
        tmp = os.path.join(self.path, f".{CURRENT}.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(version)
        os.replace(tmp, os.path.join(self.path, CURRENT))  # atomic flip
        self.vacuum()

    def _reject_null_partitions(self, df: DataFrame) -> DataFrame:
        """NULL partition values would land in Hive's
        ``__HIVE_DEFAULT_PARTITION__`` directory, which the touched-set
        string comparison can never match — a later partition-aware
        merge/delete/compact would then hard-link the stale copy of
        that partition NEXT TO its rewrite (duplicate rows) or drop it
        (lost rows). Reject at write time, inside the write itself
        (JVM raise_error in the partition column — no extra pass)."""
        for c in self.partition_by:
            dtype = df.schema[c].dataType.simpleString()
            df = df.withColumn(
                c,
                F.when(
                    F.col(c).isNull(),
                    F.raise_error(
                        F.lit(
                            f"null partition value in {c!r}: the hardlink-"
                            "reuse layout requires non-null partition columns"
                        )
                    ).cast(dtype),
                ).otherwise(F.col(c)),
            )
        return df

    def _carry_forward_metadata(self, target: str, base: Optional[str]) -> None:
        """Copy top-level ``_``-prefixed metadata files from the base
        version dir into the new one, unless the new version already
        wrote its own. Application metadata committed via
        ``extra_files`` (e.g. the streaming rollup's last-batch marker)
        must SURVIVE unrelated commits — merge, delete, compact,
        retract — or a restarted stream sees no marker and re-folds
        already-applied batches (round-4 advice: double counting)."""
        if not base:
            return
        base_dir = os.path.join(self.path, base)
        if not os.path.isdir(base_dir):
            return
        from a2b_spark.storage.stats import STATS_FILE

        for fn in os.listdir(base_dir):
            src = os.path.join(base_dir, fn)
            dst = os.path.join(target, fn)
            if (
                fn.startswith("_")
                # per-version file maps, never inherited
                and fn not in (STATS_FILE, ADDED)
                and os.path.isfile(src)
                and not os.path.exists(dst)
            ):
                shutil.copyfile(src, dst)

    def _claim_version_dir(self, tmp_target: str, version: str) -> str:
        """Atomically claim ``version``'s directory by renaming the
        uniquely-named staging dir into place. Two same-base writers
        compute the SAME next-version name; writing it directly would
        let the loser overwrite the winner's already-committed files
        mid-read. rename() onto an existing non-empty dir fails, so
        exactly one writer claims the name; the loser cleans up and
        raises before touching anything committed."""
        target = os.path.join(self.path, version)
        try:
            os.rename(tmp_target, target)
        except OSError as exc:
            shutil.rmtree(tmp_target, ignore_errors=True)
            raise ConcurrentWriteError(
                f"{self.path}: version dir {version!r} already claimed by "
                "a concurrent writer; retry against the new current version"
            ) from exc
        return target

    def _commit_info(self, op: str) -> str:
        import datetime
        import json as _json

        return _json.dumps(
            {"op": op, "ts": datetime.datetime.now(datetime.timezone.utc).isoformat()}
        )

    def history(self) -> list[dict]:
        """Commit log of the retained versions, oldest → newest — the
        DESCRIBE HISTORY analogue: [{version, op, ts}]. Versions
        written before commit-info existed report op/ts = None."""
        import json as _json

        out = []
        for v in self.versions():
            info_path = os.path.join(self.path, v, COMMIT_INFO)
            info = {"op": None, "ts": None}
            if os.path.exists(info_path):
                with open(info_path) as f:
                    info = _json.loads(f.read())
            out.append({"version": v, **info})
        return out

    def restore(self, version: str, spark: Optional[SparkSession] = None) -> None:
        """Commit a RETAINED historical version's content as the NEW
        current version (Delta ``RESTORE TABLE ... TO VERSION``): undo
        that doesn't rewrite history — the bad commits stay retained
        for audit/time-travel until vacuum, and downstream CDF sees
        the restore as one ordinary commit whose diff is the inverse
        of what it undoes.

        Metadata-only cost: every data file of the restored version is
        HARDLINKED into the new version dir (inode reuse, no data
        copied or rewritten), and the sidecars (``_SCHEMA``,
        ``_STATS``, extra metadata) come from the restored version, so
        schema evolution rolls back with the data. The appends
        streaming source rejects restore commits like any rewrite
        (op="restore" is not append-only); ``TableChangesStream``
        delivers the keyed diff."""
        versions = self.versions()
        if version not in versions:
            raise ValueError(
                f"version {version!r} not retained at {self.path}; "
                f"available: {versions}"
            )
        base = self.current_version()
        if version == base:
            return  # restoring the live version is a no-op
        cdf = None
        # the NEW version inherits the RESTORED version's _CDF_ENABLED
        # sidecar (not the base's), but change files are written when
        # EITHER side had CDF on: gating on the restored flag alone
        # would leave a flag-ON restore commit without change files
        # (permanently wedging any stream crossing it — round-9 review
        # finding), while gating only on it leaves a flag-OFF restore
        # FROM a CDF-enabled base unreadable mid-stream: unlike a
        # disable_cdf commit (layout-only, skipped), restore is a
        # content commit, so a crossing stream would raise "no change
        # files" instead of draining the inverse diff first. With both
        # gates, a stream crossing a flag-off restore consumes the
        # inverse diff, then errors on the NEXT content commit exactly
        # like any post-disable content commit.
        if self.cdf_enabled(version) or self.cdf_enabled(base):
            # the restore commit's change rows are the INVERSE of what
            # it undoes: a keyed diff current → restored snapshot
            if spark is None:
                raise ValueError(
                    f"restore on CDF-enabled table {self.path} needs the "
                    "spark session to derive the inverse change rows: "
                    "restore(version, spark)"
                )
            from a2b_spark.storage.diff import keyed_changes

            cdf = keyed_changes(
                self.read(spark, version=base),
                self.read(spark, version=version),
                self.key_cols,
                preimages=self.cdf_preimages(base)
                or self.cdf_preimages(version),
            )
        self._hardlink_commit(version, op="restore", base=base, cdf_df=cdf)

    def clone(self, dest_path: str) -> "VersionedParquetTable":
        """SHALLOW CLONE (Delta analogue): a NEW independent table at
        ``dest_path`` whose first version hardlinks this table's
        current data files — zero bytes copied, created in one
        metadata commit. The clone diverges freely afterward; vacuum
        on either side stays safe because shared bytes live until the
        last inode reference drops. Same-filesystem only (hardlink
        semantics); sidecars (schema, stats, constraints) copy so the
        clone starts with identical metadata."""
        cur = self.current_version()
        if cur is None:
            raise ValueError(f"table {self.path} has no committed versions")
        dst = VersionedParquetTable(
            dest_path,
            key_cols=self.key_cols,
            partition_by=self.partition_by,
            retention=self.retention,
            fmt=self.fmt,
            partitions_derived_from_keys=self.partitions_derived_from_keys,
        )
        if dst.current_version() is not None:
            raise ValueError(f"clone target {dest_path} already has commits")
        os.makedirs(dest_path, exist_ok=True)
        dst._hardlink_commit(cur, op="clone", base=None, src_root=self.path)
        return dst

    def _hardlink_commit(
        self,
        src_version: str,
        op: str,
        base: Optional[str],
        replace_files: Optional[dict] = None,
        src_root: Optional[str] = None,
        cdf_df: Optional[DataFrame] = None,
    ) -> None:
        """Commit a new version whose DATA files hardlink
        ``src_version``'s (metadata-only cost) and whose sidecars copy
        from it, except the ones in ``replace_files`` ({filename:
        content or None-to-omit}) — the machinery behind restore,
        constraint metadata commits, and shallow clone
        (``src_root`` points at the SOURCE table for cross-table
        linking). ``cdf_df``: change rows of THIS commit (restore's
        inverse diff); the source's own ``_cdf`` dir is never carried
        over — change files describe one commit, not its data."""
        replace = dict(replace_files or {})
        src_dir = os.path.join(src_root or self.path, src_version)
        new_version = self._next_version()
        tmp_target = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}")
        os.makedirs(tmp_target)
        for root, dirs, files in os.walk(src_dir):
            # never descend into per-commit metadata dirs (_cdf):
            # their contents are commit-scoped, not table content
            from a2b_spark.storage.stats import keep_data_dir

            dirs[:] = [d for d in dirs if keep_data_dir(d)]
            rel_root = os.path.relpath(root, src_dir)
            dst_root = (
                tmp_target
                if rel_root == "."
                else os.path.join(tmp_target, rel_root)
            )
            os.makedirs(dst_root, exist_ok=True)
            for fn in files:
                src = os.path.join(root, fn)
                dst = os.path.join(dst_root, fn)
                if fn == COMMIT_INFO or fn == ADDED or (
                    rel_root == "." and fn in replace
                ):
                    continue  # replaced (or re-labelled) below
                if fn.startswith(("_", ".")):
                    shutil.copyfile(src, dst)  # sidecars: small, own copy
                else:
                    os.link(src, dst)  # data: metadata-only reuse
        for fn, content in replace.items():
            if content is not None:
                with open(os.path.join(tmp_target, fn), "w") as f:
                    f.write(content)
        # the deletion vector is SNAPSHOT state (unlike _cdf, which is
        # commit-scoped): the hardlinked data files still hold the
        # tombstoned bytes, so restore/clone/constraint commits must
        # carry the source version's vector or those rows resurrect
        dv_src = os.path.join(src_dir, DV_DIR)
        if os.path.isdir(dv_src):
            shutil.copytree(dv_src, os.path.join(tmp_target, DV_DIR))
        self._write_cdf(tmp_target, cdf_df)
        with open(os.path.join(tmp_target, ADDED), "w") as f:
            f.write("[]")  # every data file hardlinks: no new bytes
        with open(os.path.join(tmp_target, COMMIT_INFO), "w") as f:
            f.write(self._commit_info(op))
        self._claim_version_dir(tmp_target, new_version)
        self._commit(new_version, base=base)

    # ------------------------------------------------------- constraints
    def constraints(self, version: Optional[str] = None) -> list[dict]:
        """CHECK constraints of ``version`` (default current):
        [{"name", "expr"}]. Constraints are VERSIONED metadata — they
        carry forward with every commit and roll back with restore."""
        import json as _json

        v = version or self.current_version()
        if v is None:
            return []
        p = os.path.join(self.path, v, CONSTRAINTS)
        if not os.path.exists(p):
            return []
        try:
            with open(p) as f:
                return _json.loads(f.read())
        except (OSError, ValueError):
            return []

    def add_constraint(self, spark: SparkSession, name: str, expr: str) -> None:
        """ADD CONSTRAINT name CHECK (expr) — Delta semantics: the
        EXISTING data must already satisfy the expression (checked
        here, one filter count), and every subsequent content commit
        enforces it on the written rows before anything becomes
        visible. NULL expression results pass (SQL CHECK semantics);
        only FALSE rows violate. Metadata-only commit: data files
        hardlink, op="add_constraint"."""
        import json as _json

        cur = self.current_version()
        if cur is None:
            raise ValueError(
                f"table {self.path} has no committed versions; write data "
                "first (constraints are versioned metadata)"
            )
        cons = self.constraints(cur)
        if any(c["name"] == name for c in cons):
            raise ValueError(f"constraint {name!r} already exists at {self.path}")
        bad = (
            self.read(spark, version=cur)
            .filter(~F.coalesce(F.expr(expr), F.lit(True)))
            .count()
        )
        if bad:
            raise ConstraintViolation(
                f"cannot add constraint {name!r}: {bad} existing row(s) "
                f"violate CHECK ({expr})"
            )
        self._hardlink_commit(
            cur,
            op="add_constraint",
            base=cur,
            replace_files={
                CONSTRAINTS: _json.dumps(cons + [{"name": name, "expr": expr}])
            },
        )

    def drop_constraint(self, name: str) -> None:
        """DROP CONSTRAINT name (metadata-only commit); unknown names
        raise so a typo can't silently leave enforcement on."""
        import json as _json

        cur = self.current_version()
        cons = self.constraints(cur)
        if not any(c["name"] == name for c in cons):
            raise ValueError(f"no constraint {name!r} at {self.path}")
        remaining = [c for c in cons if c["name"] != name]
        self._hardlink_commit(
            cur,
            op="drop_constraint",
            base=cur,
            replace_files={
                CONSTRAINTS: _json.dumps(remaining) if remaining else None
            },
        )

    # ------------------------------------------------- schema evolution
    def drop_columns(self, spark: SparkSession, *cols: str) -> None:
        """DROP COLUMN (Delta ``ALTER TABLE … DROP COLUMN`` parity):
        a METADATA-ONLY commit — data files hardlink the current
        version, only the ``_SCHEMA`` sidecar shrinks, and every read
        projects the surviving columns (parquet/JSON readers ignore
        extra physical columns under an explicit schema). O(file
        count), zero data rewritten — the shape that survives 100 TB.

        The dropped names are recorded in a ``_DROPPED`` tombstone
        sidecar: their physical bytes still live in the hardlinked
        files, so a later write RE-INTRODUCING such a name escalates
        to a full rewrite (merge/append handle this) — otherwise old
        partitions would resurface the pre-drop values under the new
        column. Any full-rewrite commit clears the tombstones.

        Guards: key and partition columns cannot be dropped (they are
        identity/structure, not payload); a CHECK constraint that
        still references a dropped column must be dropped first (the
        constraint set is validated against the shrunken schema);
        at least one column must survive. CDF treats the commit as
        layout-only (no row changed); ``restore`` to a pre-drop
        version brings the column back — sidecars roll back with the
        data."""
        import json as _json

        from pyspark.sql import types as T

        dropped = list(dict.fromkeys(cols))
        if not dropped:
            raise ValueError("drop_columns: no columns given")
        cur = self.current_version()
        if cur is None:
            raise ValueError(
                f"cannot drop columns at {self.path}: commit data first "
                "(schema is versioned metadata)"
            )
        schema = self._version_schema(cur)
        if schema is None:
            schema = self.read(spark, version=cur).schema
        names = {f.name for f in schema.fields}
        missing = [c for c in dropped if c not in names]
        if missing:
            raise ValueError(f"no such column(s) {missing} at {self.path}")
        protected = [
            c
            for c in dropped
            if c in set(self.key_cols) or c in set(self.partition_by or ())
        ]
        if protected:
            raise ValueError(
                f"cannot drop key/partition column(s) {protected} at "
                f"{self.path} (identity/structure, not payload)"
            )
        survivors = [f for f in schema.fields if f.name not in set(dropped)]
        if not survivors:
            raise ValueError(f"cannot drop every column of {self.path}")
        new_schema = T.StructType(survivors)
        empty = spark.createDataFrame([], new_schema)
        for c in self.constraints(cur):
            try:
                empty.filter(F.expr(c["expr"])).schema  # forces analysis
            except Exception as exc:  # AnalysisException: unresolved ref
                raise ValueError(
                    f"CHECK constraint {c['name']!r} ({c['expr']}) still "
                    f"references a dropped column; drop the constraint "
                    f"first"
                ) from exc
        tombs = sorted(self._dropped_tombstones(cur) | set(dropped))
        self._hardlink_commit(
            cur,
            op="drop_columns",
            base=cur,
            replace_files={
                SCHEMA: _json.dumps(new_schema.jsonValue()),
                DROPPED: _json.dumps(tombs),
            },
        )

    def widen_column(self, spark: SparkSession, col: str, new_type: str) -> None:
        """TYPE WIDENING (Delta ``ALTER TABLE … TYPE`` parity): a
        METADATA-ONLY commit — data files hardlink, only the
        ``_SCHEMA`` sidecar's field type widens, and every read
        upcasts the old physical values in the parquet reader (Spark 4
        reads int32 under bigint/double natively). Only the safe pairs
        in ``_WIDEN_OK`` are allowed; anything lossy (long→int,
        double→float, string↔numeric) raises. Time travel still reads
        each version under ITS OWN type; CDF treats the commit as
        layout-only (no row changed)."""
        import json as _json

        from pyspark.sql import types as T

        cur = self.current_version()
        if cur is None:
            raise ValueError(
                f"cannot widen columns at {self.path}: commit data first "
                "(schema is versioned metadata)"
            )
        schema = self._version_schema(cur)
        if schema is None:
            schema = self.read(spark, version=cur).schema
        names = {f.name: f for f in schema.fields}
        if col not in names:
            raise ValueError(f"no such column {col!r} at {self.path}")
        target = T._parse_datatype_string(new_type)
        old_s = names[col].dataType.simpleString()
        new_s = target.simpleString()
        if old_s == new_s:
            return  # already that type: no-op
        if (old_s, new_s) not in _WIDEN_OK:
            raise ValueError(
                f"cannot widen {col!r} {old_s} -> {new_s}: only the safe "
                f"upcasts {sorted(_WIDEN_OK)} are metadata-only"
            )
        new_schema = T.StructType(
            [
                T.StructField(f.name, target if f.name == col else f.dataType,
                              f.nullable, f.metadata)
                for f in schema.fields
            ]
        )
        self._hardlink_commit(
            cur,
            op="widen_column",
            base=cur,
            replace_files={SCHEMA: _json.dumps(new_schema.jsonValue())},
        )

    # ------------------------------------------------- change data feed
    def enable_cdf(self, preimages: bool = False) -> None:
        """Turn on the CHANGE DATA FEED (Delta
        ``delta.enableChangeDataFeed`` parity): from the NEXT content
        commit on, every write also stages its keyed change rows
        (after-image + ``change``) as parquet under the version's
        ``_cdf/`` dir, atomically with the data. ``preimages=True``
        additionally records old values (``update_preimage`` rows;
        deletes carry full payloads) so downstream aggregates can
        DECREMENT — see :meth:`cdf_preimages`; it assumes unique keys
        (the keyed-table contract). Streams
        (``readStream.format("a2b_table_changes")``) then read those
        files directly — no join at read time, each commit streamed N
        times for the cost of one churn-sized write. The property is
        VERSIONED metadata: it rolls back with restore and copies with
        clone; commits from before enablement have no change files
        (a stream must start at-or-after the enabling commit)."""
        if not self.key_cols:
            raise ValueError(
                "CDF requires key columns (changes are keyed diffs); "
                f"table {self.path} has none"
            )
        cur = self.current_version()
        if cur is None:
            raise ValueError(
                f"cannot enable CDF at {self.path}: commit data first "
                "(the property is versioned metadata)"
            )
        if self.cdf_enabled(cur):
            if preimages and not self.cdf_preimages(cur):
                raise ValueError(
                    f"CDF already enabled WITHOUT preimages at {self.path}; "
                    "disable_cdf() first (mixing change-row shapes across "
                    "commits would corrupt signed folds over a range)"
                )
            return
        self._hardlink_commit(
            cur,
            op="enable_cdf",
            base=cur,
            replace_files={CDF_ENABLED: "pre" if preimages else "1"},
        )

    def cdf_preimages(self, version: Optional[str] = None) -> bool:
        """True when the version's CDF records PRE-IMAGES: updates
        emit an extra ``update_preimage`` row and deletes carry their
        full old payload — the contract incremental aggregate
        maintenance (storage/ivm.py) folds over."""
        v = version or self.current_version()
        if v is None:
            return False
        p = os.path.join(self.path, v, CDF_ENABLED)
        try:
            with open(p) as f:
                return f.read().strip() == "pre"
        except OSError:
            return False

    def disable_cdf(self) -> None:
        cur = self.current_version()
        if cur is None or not self.cdf_enabled(cur):
            return
        self._hardlink_commit(
            cur, op="disable_cdf", base=cur, replace_files={CDF_ENABLED: None}
        )

    def cdf_enabled(self, version: Optional[str] = None) -> bool:
        v = version or self.current_version()
        return v is not None and os.path.exists(
            os.path.join(self.path, v, CDF_ENABLED)
        )

    def _write_cdf(self, tmp_target: str, cdf_df: Optional[DataFrame]) -> None:
        """Stage a commit's change rows under ``<staging>/_cdf/`` —
        the underscore prefix keeps Spark's directory reads and every
        internal data-file walker away from them. Unpartitioned write:
        partition columns of the table are ordinary payload columns
        here (change files are consumed by commit, not by key)."""
        if cdf_df is None:
            return
        with _stats_friendly_timestamps(cdf_df.sparkSession):
            (
                cdf_df.write.mode("overwrite")
                .format("parquet")
                .save(os.path.join(tmp_target, CDF_DIR))
            )

    def _fallback_cdf(
        self, new_df: DataFrame, base: Optional[str], op: str,
        touched: Optional[set] = None,
    ) -> Optional[DataFrame]:
        """Change rows for a content commit whose caller did not build
        them explicitly (overwrite/delete/restore/rollup paths): one
        keyed diff of the new content against the base snapshot —
        limited to the touched partitions when given (a partitioned
        commit can only change rows there)."""
        if base is None or op in LAYOUT_ONLY_OPS or not self.cdf_enabled(base):
            return None
        from a2b_spark.storage.diff import keyed_changes

        before = self.read(new_df.sparkSession, version=base)
        if touched is not None:
            before = before.filter(self._partition_filter(touched))
        return keyed_changes(
            before, new_df, self.key_cols,
            preimages=self.cdf_preimages(base),
        )

    def _dropped_tombstones(self, version: Optional[str]) -> set[str]:
        """Column names dropped at-or-before ``version`` whose physical
        data may survive in hardlinked files (see :meth:`drop_columns`)."""
        import json as _json

        if version is None:
            return set()
        p = os.path.join(self.path, version, DROPPED)
        if not os.path.exists(p):
            return set()
        with open(p) as f:
            return set(_json.load(f))

    def _constraint_observation(self, df: DataFrame, base: Optional[str]):
        """Single-pass CHECK enforcement (Delta's design): attach ONE
        ``Observation`` whose per-constraint violation counts are
        computed DURING the staging write itself — a constrained merge
        runs its join exactly once, and N constraints are N aggregate
        expressions in one pass, not N extra actions. Returns
        ``(df, check)``; callers run the staging action on the
        returned df, then call ``check()`` BEFORE the ``_CURRENT``
        flip — on violation it raises :class:`ConstraintViolation`, so
        the table never exposes a half-valid version (the staged tmp
        dir is the caller's to discard). Zero cost when no constraints
        exist: the frame is returned untouched."""
        cons = [] if base is None else self.constraints(base)
        if not cons:
            return df, lambda: None
        from pyspark.sql import Observation

        obs = Observation()
        metrics = [
            F.sum(
                F.when(
                    ~F.coalesce(F.expr(c["expr"]), F.lit(True)), F.lit(1)
                ).otherwise(F.lit(0))
            ).alias(f"viol_{i}")
            for i, c in enumerate(cons)
        ]
        observed = df.observe(obs, *metrics)

        def check() -> None:
            got = obs.get  # blocks until the staging action finished
            for i, c in enumerate(cons):
                bad = got.get(f"viol_{i}") or 0  # empty write sums to NULL
                if bad:
                    raise ConstraintViolation(
                        f"{bad} row(s) violate CHECK constraint {c['name']!r} "
                        f"({c['expr']}) at {self.path}"
                    )

        return observed, check

    def overwrite(
        self,
        df: DataFrame,
        extra_files: Optional[dict] = None,
        op: str = "overwrite",
        base=_UNSET_BASE,
        cdf_df: Optional[DataFrame] = None,
    ) -> None:
        """``extra_files``: {filename: text} written into the NEW
        version directory BEFORE the commit flip — metadata that must
        be atomic with the data (e.g. a streaming fold's last-batch
        marker); a crash can never commit one without the other.
        ``op`` labels the commit in :meth:`history`. ``base``: the
        version this write's CONTENT derived from (read-modify-write
        callers pass their snapshot version so the optimistic check
        covers the whole read-to-commit span, not just the write).
        ``cdf_df``: this commit's change rows when the caller already
        derived them cheaply (merge/append); on a CDF-enabled table
        they default to a keyed diff against the base snapshot."""
        if base is _UNSET_BASE:
            base = self.current_version()
        if op != "compact":  # layout-only rewrite of validated data
            df, _check_constraints = self._constraint_observation(df, base)
        else:
            _check_constraints = lambda: None  # noqa: E731
        if cdf_df is None:
            cdf_df = self._fallback_cdf(df, base, op)
        version = self._next_version()
        os.makedirs(self.path, exist_ok=True)
        tmp_target = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}")
        if self.partition_by:
            df = self._reject_null_partitions(df)
        writer = df.write.mode("overwrite").format(self.fmt).options(**_FORMAT_OPTIONS[self.fmt])
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        with _stats_friendly_timestamps(df.sparkSession):
            writer.save(tmp_target)
        try:
            _check_constraints()  # BEFORE the flip; staged dir discarded
        except ConstraintViolation:
            shutil.rmtree(tmp_target, ignore_errors=True)
            raise
        self._write_cdf(tmp_target, cdf_df)
        # per-VERSION schema sidecar: committed atomically with the
        # data and carried forward like other metadata, so a failed
        # concurrent commit or schema evolution can never corrupt
        # reads of OTHER versions (a table-root sidecar did both).
        # Written for EVERY format: a version holding zero rows writes
        # no data files at all (Spark emits nothing for an empty
        # partitioned frame), and the sidecar is then the only record
        # of the schema — read() falls back to a typed empty frame.
        import json as _json

        for fn, content in {
            **(extra_files or {}),
            SCHEMA: _json.dumps(df.schema.jsonValue()),
            COMMIT_INFO: self._commit_info(op),
        }.items():
            with open(os.path.join(tmp_target, fn), "w") as f:
                f.write(content)
        self._write_added_sidecar(tmp_target)  # full rewrite: all fresh
        self._write_stats_sidecar(tmp_target, base)
        self._carry_forward_metadata(tmp_target, base)  # base resolved above
        # a full rewrite wrote every data file fresh: no hardlinked
        # pre-drop bytes survive, so drop-column tombstones clear here
        dropped_marker = os.path.join(tmp_target, DROPPED)
        if os.path.exists(dropped_marker):
            os.remove(dropped_marker)
        self._claim_version_dir(tmp_target, version)
        self._commit(version, base=base)

    def merge(self, batch: DataFrame) -> None:
        """Keyed upsert (MERGE INTO … WHEN MATCHED UPDATE WHEN NOT
        MATCHED INSERT), NULL-safe on the key columns."""
        spark = batch.sparkSession
        base = self.current_version()
        if base is None:
            self.overwrite(batch, op="merge", base=None)
            return
        tombstone_clash = bool(
            self._dropped_tombstones(base) & set(batch.columns)
        )
        # PIN the batch once (eager localCheckpoint, the repo's
        # fan-out-frame discipline, like delete_keys pins its key set):
        # merge consults it from up to 4 independent actions — the
        # _prunable_key_files pre-check/distinct collects, the touched-
        # partition collects, the staged data write, and the CDF
        # change-file write. A non-deterministic batch (sampled/rand
        # lineage) re-evaluated per action could prune files by key set
        # A, commit data for set B, and record change rows for set C.
        # Skipped only when exactly one action will consult it (the
        # unpartitioned tombstone-clash full rewrite without CDF). On
        # the partitioned-merge path the pin job ALSO answers which
        # partitions the batch touches (observation riding the
        # checkpoint pass — same fold as append's).
        touched_pre: Optional[set] = None
        if self.partition_by and not tombstone_clash:
            batch, touched_pre = self._pin_with_touched(batch)
        elif self.partition_by or not tombstone_clash or self.cdf_enabled(base):
            batch = batch.localCheckpoint(eager=True)
        if (
            not self.partition_by
            and not tombstone_clash
            and self._try_merge_file_pruned(spark, batch, base)
        ):
            return
        current = self.read(spark, version=base)  # pinned snapshot
        cdf = None
        if self.cdf_enabled(base):
            # batch-sized change join (NOT a table-sized diff of the
            # merged output — see diff.merge_changes)
            from a2b_spark.storage.diff import merge_changes

            cdf = merge_changes(
                current, batch, self.key_cols,
                preimages=self.cdf_preimages(base),
            )
        if self.partition_by and not tombstone_clash:
            self._merge_partitioned(
                spark, current, batch, base, cdf_df=cdf, touched=touched_pre
            )
        else:
            # unpartitioned — or the batch RE-INTRODUCES a dropped
            # column: untouched hardlinked partitions still hold the
            # pre-drop physical values, so a full rewrite (which the
            # overwrite path is) must replace them before the name is
            # live again; the rewrite clears the tombstone
            self.overwrite(
                merge_dataframes(current, batch, self.key_cols),
                op="merge",
                base=base,
                cdf_df=cdf,
            )

    def append(self, batch: DataFrame, dedupe_keys: Sequence[str] | None = None) -> None:
        """Insert-only commit: add batch rows, optionally skipping rows
        whose ``dedupe_keys`` tuple already exists (NULL-safe), so
        re-runs are idempotent.

        On a PARTITIONED table only the batch's partitions are
        rewritten (existing rows of those partitions union the new
        ones; every other partition hard-links) — a streaming ingest
        appending into a growing table costs O(batch + touched), not a
        full-table rewrite per commit. The dedupe anti-join still
        compares against the WHOLE current table (a thin key scan,
        not a rewrite), so idempotence holds even when dedupe keys
        span partitions."""
        base = self.current_version()
        if base is None:
            self.overwrite(batch, op="append", base=None)
            return
        # PIN the batch once when more than one action will consult it
        # (touched-partition collect, duplicate-key CDC guard, CDF
        # change-file write, the data write itself) — see merge() for
        # the non-deterministic-lineage divergence this prevents. On a
        # partitioned table the pin job ALSO answers which partitions
        # the batch touches (observation riding the checkpoint pass).
        touched_pre: Optional[set] = None
        if self.partition_by and not dedupe_keys:
            batch, touched_pre = self._pin_with_touched(batch)
        elif self.partition_by or self.cdf_enabled(base):
            # with dedupe_keys the touched set must be recomputed on the
            # POST-anti-join batch anyway (a partition whose rows all
            # dedupe away must hardlink, not rewrite), so the
            # observation would be wasted — plain pin
            batch = batch.localCheckpoint(eager=True)
        current = self.read(batch.sparkSession, version=base)
        if dedupe_keys:
            c = current.alias("e")
            b = batch.alias("b")
            cond = None
            for k in dedupe_keys:
                e = F.col(f"b.{k}").eqNullSafe(F.col(f"e.{k}"))
                cond = e if cond is None else (cond & e)
            batch = b.join(c, on=cond, how="left_anti")
        cdf = None
        if self.cdf_enabled(base):
            if self.key_cols and not dedupe_keys:
                # append stamps every change row 'insert'; a batch key
                # that ALREADY exists would make the two CDC surfaces
                # disagree (batch table_changes' keyed diff reports
                # 'update' — or nothing — for it) AND leave the table
                # duplicate-keyed. A clashing key fails loudly; the
                # probe side is BOUNDED so fresh-key appends (the
                # streaming-ingest hot path) never pay a whole-table
                # key scan: on an unpartitioned clustered table only
                # the files whose _STATS key band overlaps the batch
                # are probed, and with key-derived partitions only the
                # batch's own partitions can hold a clash.
                from a2b_spark.storage.diff import null_safe_key_cond

                probe = current
                if not self.partition_by:
                    info = self._prunable_key_files(batch, base)
                    if info is not None:
                        kept_abs, _, schema = info
                        probe = self._read_files(
                            batch.sparkSession, base, kept_abs, schema
                        )
                elif self.partitions_derived_from_keys:
                    # dedupe_keys is None in this branch, so the pin's
                    # observation already answered the touched set
                    touched = (
                        touched_pre
                        if touched_pre is not None
                        else self._touched_partitions(batch)
                    )
                    probe = current.filter(self._partition_filter(touched))
                clash = (
                    batch.alias("b")
                    .join(
                        probe.alias("c"),
                        null_safe_key_cond(self.key_cols, "b", "c"),
                        "left_semi",
                    )
                    .limit(1)
                    .count()
                )
                if clash:
                    raise ValueError(
                        f"append on CDF-enabled keyed table {self.path}: "
                        "batch contains a key that already exists, so the "
                        "'insert' change rows would contradict the keyed "
                        "diff. Pass dedupe_keys= to skip existing keys, or "
                        "use merge() to update them"
                    )
            # insert-only commit: the change rows ARE the batch
            cdf = batch.withColumn("change", F.lit("insert"))
        if self.partition_by and not (
            self._dropped_tombstones(base) & set(batch.columns)
        ):
            dv = self._dv_df(batch.sparkSession, base)
            if dv is not None and self.key_cols:
                # a batch key that is DV-tombstoned would be HIDDEN by
                # the carried vector the moment it lands (the stale
                # physical row may live in a partition this append
                # hardlinks, so the vector cannot simply drop the
                # key). merge() handles re-introduction by rewriting
                # the stale row's partition; append must not silently
                # swallow the row. Bounded: the vector is <= 64k keys.
                from a2b_spark.storage.diff import null_safe_key_cond

                clash = (
                    batch.alias("b")
                    .join(
                        F.broadcast(dv.alias("d")),
                        null_safe_key_cond(self.key_cols, "b", "d"),
                        "left_semi",
                    )
                    .limit(1)
                    .count()
                )
                if clash:
                    raise ValueError(
                        f"append on {self.path}: batch contains a key "
                        "that is deletion-vector-tombstoned; the carried "
                        "vector would hide the new row. Use merge() (it "
                        "rewrites the stale partition and trims the "
                        "vector) or purge_deleted() first"
                    )
            touched = (
                touched_pre
                if touched_pre is not None
                else self._touched_partitions(batch)
            )
            if not touched:
                return
            appended = (
                current.filter(self._partition_filter(touched))
                .unionByName(batch, allowMissingColumns=True)
            )
            self._commit_touched(
                appended, touched, op="append", base=base, cdf_df=cdf
            )
            return
        # unpartitioned — or re-introducing a dropped column (see
        # merge(): hardlinked partitions would resurface stale values)
        self.overwrite(
            current.unionByName(batch, allowMissingColumns=True),
            op="append",
            base=base,
            cdf_df=cdf,
        )

    def delete_keys(self, keys_df: DataFrame) -> None:
        """Remove every current row whose key tuple appears in
        ``keys_df`` (NULL-safe, matching merge/append's key
        semantics). On a partitioned table only the partitions that
        actually HOLD matching rows are rewritten (derived from the
        current data, so callers need not — and cannot wrongly —
        supply partition values); the rest hard-link. On an
        UNPARTITIONED key-clustered table the same ``_STATS``
        file-pruning as merge applies: files that cannot hold any
        deleted key hard-link unchanged. With CDF enabled the change
        rows come from one batch-sized SEMI join (the deleted rows
        with NULL payloads), not a table-sized diff."""
        base = self.current_version()
        if base is None:
            return
        from a2b_spark.storage.diff import null_safe_key_cond

        current = self.read(keys_df.sparkSession, version=base)
        # PIN the key set once (eager localCheckpoint, the repo's
        # fan-out-frame discipline): delete consults it from up to 4
        # independent actions (partition/file pruning, the anti join,
        # the CDF semi join) — a non-deterministic keys_df re-evaluated
        # per action would hard-link files by key set A while deleting
        # set B and recording set C
        keys = (
            keys_df.select(*self.key_cols).distinct().localCheckpoint(eager=True)
        )

        def _remaining(cur: DataFrame) -> DataFrame:
            return cur.alias("c").join(
                keys.alias("k"),
                null_safe_key_cond(self.key_cols, "c", "k"),
                "left_anti",
            )

        def _delete_cdf(cur: DataFrame) -> Optional[DataFrame]:
            if not self.cdf_enabled(base):
                return None
            reserved = {"change", "_commit_version"} & set(cur.columns)
            if reserved:
                raise ValueError(
                    "table data columns collide with reserved CDF output "
                    f"columns {sorted(reserved)}; rename them before "
                    "enabling CDF"
                )
            matched = cur.alias("c").join(
                keys.alias("k"),
                null_safe_key_cond(self.key_cols, "c", "k"),
                "left_semi",
            )
            if self.cdf_preimages(base):
                # pre-image contract: deletes carry their full old
                # payload so signed folds can decrement (unique keys
                # assumed — the keyed-table contract)
                return matched.withColumn("change", F.lit("delete"))
            # KEY-level delete rows (the keyed-diff contract of batch
            # table_changes — a duplicate-keyed physical layout must
            # still emit one row per key) with NULL payloads; one semi
            # join bounded by the key batch
            deleted = matched.select(*self.key_cols).distinct()
            payload = [c for c in cur.columns if c not in set(self.key_cols)]
            return deleted.select(
                *self.key_cols,
                *[
                    F.lit(None).cast(cur.schema[c].dataType).alias(c)
                    for c in payload
                ],
                F.lit("delete").alias("change"),
            )

        # deletion vectors first, partitioned or not: a small delete
        # commits metadata-sized (every data file hardlinks — the
        # loop preserves partition subdirs — and only the key list is
        # written); the rewrite paths below are the cap-overflow
        # fallback
        if self.deletion_vectors and self.fmt in ("parquet", "orc"):
            if self._try_delete_dv(keys_df.sparkSession, current, keys, base):
                return
        if self.partition_by:
            touched = self._key_match_partitions(current, keys)
            if not touched:
                return
            scoped = current.filter(self._partition_filter(touched))
            # dv_df=None CARRIES any live vector: its keys in the
            # rewritten partitions are staged out by the DV-filtered
            # read (stale entries are no-op anti joins); keys in
            # hardlinked partitions still need it
            self._commit_touched(
                _remaining(scoped),
                touched,
                op="delete",
                base=base,
                cdf_df=_delete_cdf(scoped),
            )
            return
        kept_info = self._prunable_key_files(keys, base, pinned_distinct=True)
        if kept_info is not None:
            kept_abs, keep_rels, schema = kept_info
            scoped = self._read_files(
                keys_df.sparkSession, base, kept_abs, schema
            )
            self._commit_linked_files(
                _remaining(scoped),
                keep_rels,
                op="delete",
                base=base,
                cdf_df=_delete_cdf(scoped),
            )
            return
        self.overwrite(
            _remaining(current), op="delete", base=base,
            cdf_df=_delete_cdf(current),
        )

    # ------------------------------------------------- partitioned merge
    def _pin_with_touched(self, batch: DataFrame) -> tuple[DataFrame, set[tuple]]:
        """Pin ``batch`` AND discover its touched partitions in the
        SAME Spark job: the checkpoint is LAZY and the
        ``_touched_partitions`` distinct+collect is its materializing
        action, so the standalone eager-checkpoint job disappears and
        later consumers read the pinned blocks. (A first version rode
        a ``collect_set`` Observation on an eager checkpoint instead —
        same job count, but ``Observation.get`` waits on the async
        listener bus, measured ~80ms per call, which at ~10 commits
        per storage walk cost MORE than the collect job it removed.
        The collect is a plain all-partitions action — none of the
        CollectLimit incremental-materialization hazards that made the
        lazy pin lose in connected_components.) Semantics are
        identical: same cast('string') dialect, DISTINCT dedup, and
        the NULL partition-value check still raises before any
        commit work."""
        pinned = batch.localCheckpoint(eager=False)
        return pinned, self._touched_partitions(pinned)

    def _touched_partitions(self, df: DataFrame) -> set[tuple]:
        """Partition tuples present in ``df`` — a small driver-side list
        (partition columns are low-cardinality by design; this is not a
        data collect). Values are stringified by SPARK's cast('string'),
        never Python str(): the two disagree on booleans ('true' vs
        'True') and float formatting, and every consumer
        (_partition_filter, the Hive dir names) speaks Spark's dialect
        — a Python-str mismatch silently turned merges into
        insert-plus-hardlink duplication."""
        rows = (
            df.select(
                *[F.col(c).cast("string").alias(c) for c in self.partition_by]
            )
            .distinct()
            .collect()
        )
        for r in rows:
            if any(x is None for x in r):
                raise ValueError(
                    "null partition value in batch: the hardlink-reuse "
                    "layout requires non-null partition columns "
                    f"(partition_by={self.partition_by})"
                )
        return {tuple(r) for r in rows}

    def _partition_filter(self, touched: set[tuple]):
        cond = None
        for i, c in enumerate(self.partition_by):
            e = F.col(c).cast("string").isin([t[i] for t in touched])
            cond = e if cond is None else (cond & e)
        return cond

    def _commit_touched(
        self,
        touched_df: DataFrame,
        touched: set[tuple],
        op: str = "merge",
        base=_UNSET_BASE,
        extra_files: Optional[dict] = None,
        cdf_df: Optional[DataFrame] = None,
        dv_df: Optional[DataFrame] = None,
        dv_state: Optional[str] = None,
    ) -> None:
        """Write a new version containing ``touched_df`` (the new
        contents of the touched partitions) and hard-link every
        untouched partition's files from the live version — a
        metadata-only copy, the local-FS analogue of Iceberg manifest
        reuse. Cost: O(touched data + total file count).

        ``dv_df`` follows :meth:`_commit_linked_files`'s contract:
        None CARRIES the hardlink source's deletion vector (untouched
        partitions may still hold tombstoned bytes; rewritten
        partitions were staged from the DV-FILTERED read, so stale
        vector entries for them are harmless no-op anti joins); a
        DataFrame REPLACES it (empty = cleared)."""
        old_version = self.current_version()
        if base is _UNSET_BASE:
            base = old_version
        stale = self._dropped_tombstones(old_version) & set(touched_df.columns)
        if stale:
            # unreachable via merge/append (they escalate to a full
            # rewrite) — insurance for future call sites: hardlinking
            # untouched partitions would resurface pre-drop values
            raise ValueError(
                f"column(s) {sorted(stale)} were dropped and their physical "
                f"data survives in hardlinked files at {self.path}; "
                "re-introduce them via a full rewrite (overwrite/merge)"
            )
        if op not in ("compact", "purge"):  # layout-only rewrites of
            touched_df, _check_constraints = self._constraint_observation(
                touched_df, base
            )  # ^ already-validated data skip re-validation
        else:
            _check_constraints = lambda: None  # noqa: E731
        if cdf_df is None:
            # a partitioned commit can only change rows in its touched
            # partitions — the fallback diff is bounded accordingly
            cdf_df = self._fallback_cdf(touched_df, base, op, touched=touched)
        old_dir = os.path.join(self.path, old_version)
        version = self._next_version()
        tmp_target = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}")
        with _stats_friendly_timestamps(touched_df.sparkSession):
            (
                self._reject_null_partitions(touched_df).write.mode("overwrite")
                .format(self.fmt)
                .options(**_FORMAT_OPTIONS[self.fmt])
                .partitionBy(*self.partition_by)
                .save(tmp_target)
            )
        try:  # BEFORE hard-linking untouched partitions or the flip
            _check_constraints()
        except ConstraintViolation:
            shutil.rmtree(tmp_target, ignore_errors=True)
            raise
        self._write_cdf(tmp_target, cdf_df)
        self._write_added_sidecar(tmp_target)  # before the hardlinks
        for leaf, values in _leaf_partitions(old_dir, len(self.partition_by)):
            if values in touched:
                continue
            dst = os.path.join(tmp_target, os.path.relpath(leaf, old_dir))
            os.makedirs(dst, exist_ok=True)
            for fn in os.listdir(leaf):
                if fn.startswith(("_", ".")):
                    continue
                os.link(os.path.join(leaf, fn), os.path.join(dst, fn))
        import json as _json

        for fn, content in {
            **(extra_files or {}),
            SCHEMA: _json.dumps(touched_df.schema.jsonValue()),
            COMMIT_INFO: self._commit_info(op),
        }.items():
            with open(os.path.join(tmp_target, fn), "w") as f:
                f.write(content)
        # old_version (the hardlink source), not base: inode reuse is
        # against the dir the untouched partitions were linked FROM
        self._write_stats_sidecar(tmp_target, old_version)
        self._carry_forward_metadata(tmp_target, old_version)
        self._stage_dv(tmp_target, old_version, dv_df, dv_state=dv_state)
        self._claim_version_dir(tmp_target, version)
        self._commit(version, base=base)

    def _key_match_partitions(self, current: DataFrame, keys: DataFrame) -> set[tuple]:
        """Partitions of CURRENT rows whose key matches ``keys``
        (NULL-safe). A batch row may carry a DIFFERENT partition value
        than the stored row with the same key (partition columns are
        data, not identity); rewriting only the batch's partitions
        would hard-link the stale old row alongside the new one —
        duplicate keys. Cost: one key+partition-column scan of the
        current version (columnar, no rewrite) — the price of allowing
        keys to move between partitions."""
        c = current.alias("c")
        k = keys.select(*self.key_cols).distinct().alias("k")
        cond = None
        for col in self.key_cols:
            e = F.col(f"c.{col}").eqNullSafe(F.col(f"k.{col}"))
            cond = e if cond is None else (cond & e)
        return self._touched_partitions(
            c.join(k, cond, "left_semi").select(*self.partition_by)
        )

    def _merge_partitioned(
        self, spark: SparkSession, current: DataFrame, batch: DataFrame, base=None,
        cdf_df: Optional[DataFrame] = None,
        touched: Optional[set] = None,
    ) -> None:
        from a2b_spark.storage.diff import null_safe_key_cond

        # merge() passes the batch's touched set when its pin job
        # already answered it (observation fold); recompute only when
        # called without one
        if touched is None:
            touched = self._touched_partitions(batch)
        if not self.partitions_derived_from_keys:
            # keys may move between partitions: also rewrite wherever
            # the batch's keys CURRENTLY live (one thin scan)
            touched = touched | self._key_match_partitions(current, batch)
        if not touched:
            return
        dv_new = None
        dv = self._dv_df(spark, base)
        if dv is not None:
            # a merged key that was DV-tombstoned is RE-INTRODUCED:
            # its stale PHYSICAL row is invisible to `current` (the
            # DV-filtered read), so the key-match scan above cannot
            # find its partition — locate it on the UNFILTERED read
            # and force that partition into the rewrite set, else the
            # commit would hardlink the stale bytes while dropping the
            # key from the vector (resurrection + duplicate). With
            # key-derived partitions the stale row's partition equals
            # the batch row's and is already touched.
            reintro = dv.alias("__dv").join(
                batch.select(*self.key_cols).alias("__b"),
                null_safe_key_cond(self.key_cols, "__dv", "__b"),
                "left_semi",
            )
            if not self.partitions_derived_from_keys:
                raw = self._read_nodv(spark, base)
                touched = touched | self._touched_partitions(
                    raw.alias("r")
                    .join(
                        F.broadcast(reintro.alias("k")),
                        null_safe_key_cond(self.key_cols, "r", "k"),
                        "left_semi",
                    )
                    .select(*self.partition_by)
                )
            # every re-introduced key's stale bytes now sit in a
            # rewritten (DV-filtered) partition: trim it; other keys
            # stay (their bytes remain hardlinked)
            dv_new = dv.alias("__dv").join(
                batch.select(*self.key_cols).alias("__b"),
                null_safe_key_cond(self.key_cols, "__dv", "__b"),
                "left_anti",
            )
        merged_touched = merge_dataframes(
            current.filter(self._partition_filter(touched)), batch, self.key_cols
        )
        self._commit_touched(
            merged_touched, touched, op="merge", base=base, cdf_df=cdf_df,
            dv_df=dv_new,
        )

    # the key types whose batch min/max can be compared against file
    # stats without cross-timezone/truncation subtleties
    _PRUNABLE_KEY_TYPES = (
        "tinyint", "smallint", "int", "bigint",
        "string", "date", "float", "double",
    )

    def _try_merge_file_pruned(self, spark: SparkSession, batch, base) -> bool:
        """Delta-style MERGE file pruning on an UNPARTITIONED parquet
        table: files whose ``_STATS`` key range excludes every batch
        key cannot hold a matched row — they HARD-LINK into the new
        version unchanged, and only the possibly-matching files are
        read, merged with the batch, and rewritten. A small-batch
        merge into a large key-clustered table (compact(cluster_by=
        key)) then costs O(batch + touched files), not a full-table
        rewrite — the partition-level touched commit, at file
        granularity.

        Returns False (caller runs the full-rewrite path) when the
        sidecar is missing, the first key's type is outside the
        stats-comparable set, the batch holds NULL first-keys (NULL
        never falls in a [min,max] band, but NULL-keyed rows DO merge
        under eqNullSafe), or pruning keeps every file anyway."""
        info = self._prunable_key_files(batch, base)
        if info is None:
            return False
        kept_abs, keep_rels, schema = info
        # load the vector ONCE: both the DV-filtered read and the
        # re-introduction trim below consult it
        dv = self._dv_df(spark, base)
        current_touched = self._read_files(spark, base, kept_abs, schema, dv=dv)
        merged = merge_dataframes(current_touched, batch, self.key_cols)
        cdf = None
        if self.cdf_enabled(base):
            from a2b_spark.storage.diff import merge_changes

            # matched rows live ONLY in kept files (the pruning
            # contract), so the touched subset yields identical changes
            cdf = merge_changes(
                current_touched, batch, self.key_cols,
                preimages=self.cdf_preimages(base),
            )
        dv_new = None
        if dv is not None:
            # a merged key that was DV-tombstoned is RE-INTRODUCED by
            # this commit: its stats-matching files (the only places
            # its stale bytes live) are being rewritten DV-filtered
            # right here, so the key leaves the vector — otherwise the
            # fresh row would stay hidden at read
            from a2b_spark.storage.diff import null_safe_key_cond

            dv_new = dv.alias("__dv").join(
                batch.select(*self.key_cols).alias("__b"),
                null_safe_key_cond(self.key_cols, "__dv", "__b"),
                "left_anti",
            )
        self._commit_linked_files(
            merged, keep_rels, op="merge", base=base, cdf_df=cdf, dv_df=dv_new
        )
        return True

    def _try_delete_dv(
        self, spark: SparkSession, current: DataFrame, keys: DataFrame,
        base: str,
    ) -> bool:
        """DELETION-VECTOR delete on a parquet or ORC table,
        partitioned or not: commit = every data file HARDLINKED (the link loop
        recreates partition subdirs) + the tombstone key list unioned
        into ``_dv/`` — zero data files rewritten, metadata-sized
        regardless of how large the touched files or partitions are
        (the step past file-granular pruning, which still rewrites a
        whole file to drop one row). Falls back (returns False) when
        the combined vector would exceed DV_MAX_KEYS — the rewrite
        paths then purge physically. No-op deletes (no live key
        matched) return True without a commit, like the partitioned
        path.

        ``current`` is the DV-FILTERED snapshot, so re-deleting an
        already-tombstoned key never bloats the vector, and the CDF
        change rows (key-level, NULL payload — same contract as every
        delete path) fire only for genuinely live rows. The matched
        key set is PINNED once (capped at DV_MAX_KEYS+1 rows before
        materialization) and every downstream consumer — the size
        check, the vector union, the CDF rows — derives from the
        pinned blocks: a 2-key delete on a billion-row table pays ONE
        current-table key scan, not four.

        PRECONDITION: ``keys`` must already be materialized (its only
        caller, :meth:`delete_keys`, eagerly localCheckpoints the key
        frame before dispatching here). This method consults ``keys``
        from three independent actions — the ``_prunable_key_files``
        pre-check and distinct-collect, then the match semi join — so
        a lazy, expensive keys plan would re-run its upstream lineage
        three times (round-11 advice). With the pin those are three
        cheap scans of checkpointed blocks."""
        from a2b_spark.storage import stats as _stats
        from a2b_spark.storage.diff import null_safe_key_cond

        # pin the matched rows (capped before materialization): vector
        # keys, the size check, and the CDF rows all derive from the
        # pinned blocks. FULL rows are pinned only when CDF pre-images
        # need the payloads — otherwise the scan projects the KEY
        # COLUMNS alone, so on a wide table the whole delete reads a
        # few key columns' pages, not the table (the difference
        # between "metadata-sized" and "one full-width scan")
        need_payload = self.cdf_enabled(base) and self.cdf_preimages(base)
        # STATS-SCOPED scan (round-11): the same ``_STATS`` key-band
        # pruning merge uses picks the files that can physically hold
        # the deleted keys — on a many-partition table the match scan
        # then reads O(touched files), not O(table), which is what
        # lets the vector path beat a partition rewrite at high
        # partition counts (the SCALE_TRAJECTORY dv_partitioned
        # probe). ``_read_files`` applies the live vector, preserving
        # the "current is DV-filtered" invariant the no-bloat and
        # CDF-only-live contracts below rely on. Fallback: no sidecar
        # or unprunable keys → the full DV-filtered read, as before.
        pruned = self._prunable_key_files(keys, base, pinned_distinct=True)
        if pruned is not None:
            kept_abs, _, schema = pruned
            scan = self._read_files(spark, base, kept_abs, schema)
        else:
            scan = current
        pin_src = scan if need_payload else scan.select(*self.key_cols)
        matched = (
            pin_src.alias("c")
            .join(
                keys.alias("k"),
                null_safe_key_cond(self.key_cols, "c", "k"),
                "left_semi",
            )
            .limit(DV_MAX_KEYS + 1)
            .localCheckpoint(eager=True)
        )
        deleted = matched.select(*self.key_cols).distinct()
        # ONE aggregation answers both sizes over the pinned blocks
        # (matched-row count for the cap check, distinct-key count for
        # the vector budget) — groupBy keeps NULL key groups, so the
        # distinct count is NULL-safe like the distinct() it replaces
        sizes = (
            matched.groupBy(*self.key_cols)
            .agg(F.count(F.lit(1)).alias("__c"))
            .agg(
                F.count(F.lit(1)).alias("n_new"),
                F.sum("__c").alias("n_matched"),
            )
            .first()
        )
        n_new = sizes["n_new"]
        if n_new == 0:
            return True  # nothing live matched: no commit
        if sizes["n_matched"] > DV_MAX_KEYS:
            return False  # cap hit before the limit: set size unknown
        old_dv = self._dv_df(spark, base)
        # footer-metadata count: no Spark job for the existing vector
        n_old = self._dv_count(base) if old_dv is not None else 0
        if n_old + n_new > DV_MAX_KEYS:
            return False  # vector would outgrow its broadcast budget
        # disjoint by construction (current is DV-filtered), so a
        # plain union IS the new distinct vector
        dv_new = (
            old_dv.unionByName(deleted) if old_dv is not None else deleted
        )
        cdf = None
        if self.cdf_enabled(base):
            reserved = {"change", "_commit_version"} & set(current.columns)
            if reserved:
                raise ValueError(
                    "table data columns collide with reserved CDF output "
                    f"columns {sorted(reserved)}; rename them before "
                    "enabling CDF"
                )
            if self.cdf_preimages(base):
                cdf = matched.withColumn("change", F.lit("delete"))
            else:
                # key-level NULL-payload delete rows straight from the
                # pinned set — no second semi join over the table
                payload = [
                    c for c in current.columns if c not in set(self.key_cols)
                ]
                cdf = deleted.select(
                    *self.key_cols,
                    *[
                        F.lit(None).cast(current.schema[c].dataType).alias(c)
                        for c in payload
                    ],
                    F.lit("delete").alias("change"),
                )
        vdir = os.path.join(self.path, base)
        keep_rels = _stats._data_files(vdir)
        self._commit_linked_files(
            None,  # no new rows: hardlinks + vector only
            keep_rels,
            op="delete",
            base=base,
            cdf_df=cdf,
            # n_new > 0 above: the union vector is non-empty by
            # construction — skip the isEmpty probe action
            dv_df=dv_new,
            dv_state="nonempty",
        )
        return True

    def purge_deleted(self, spark: SparkSession) -> dict:
        """Physically remove the deletion vector's tombstoned rows —
        the DV maintenance op (Delta's REORG TABLE ... APPLY (PURGE)):
        rewrite ONLY the files whose ``_STATS`` key band can hold a
        tombstoned key (DV-filtered read, like any pruned rewrite) —
        or, on a PARTITIONED table, only the partitions that
        physically hold tombstoned rows — hardlink everything else,
        and clear the vector. A layout-only commit: row content is
        identical before and after (CDF consumers skip it), but the
        table stops paying the per-read anti join and vacuum can
        eventually reclaim the tombstoned bytes. Falls back to
        rewriting all files when the sidecar cannot band-match (no
        stats / unprunable key type). Returns {"files_rewritten",
        "files_linked", "purged_keys"}."""
        base = self.current_version()
        out = {"files_rewritten": 0, "files_linked": 0, "purged_keys": 0}
        if base is None:
            return out
        dv = self._dv_df(spark, base)
        if dv is None:
            return out
        from a2b_spark.storage import stats as _stats

        n_keys = self._dv_count(base)  # footer metadata: no Spark job
        vdir = os.path.join(self.path, base)
        all_rels = _stats._data_files(vdir)
        if self.partition_by:
            # PARTITION-granular purge: locate the partitions that
            # physically hold tombstoned rows on the UNFILTERED read
            # (the filtered read cannot see them), rewrite exactly
            # those DV-filtered, hardlink the rest, clear the vector.
            # _commit_linked_files is layout-unsafe here — its writer
            # would stage root-level files into a hive-partitioned dir.
            from a2b_spark.storage.diff import null_safe_key_cond

            raw = self._read_nodv(spark, base)
            touched = self._touched_partitions(
                raw.alias("r")
                .join(
                    F.broadcast(dv.alias("d")),
                    null_safe_key_cond(self.key_cols, "r", "d"),
                    "left_semi",
                )
                .select(*self.partition_by)
            )
            if not touched:
                # vector keys with no physical rows left (all their
                # partitions were rewritten since): clear the vector
                # with an all-hardlink commit (no writer involved)
                self._commit_linked_files(
                    None, all_rels, op="purge", base=base,
                    dv_df=dv.limit(0), dv_state="empty",
                )
                return {
                    "files_rewritten": 0,
                    "files_linked": len(all_rels),
                    "purged_keys": n_keys,
                }
            scoped = self.read(spark, version=base).filter(
                self._partition_filter(touched)
            )
            untouched_leaves = [
                os.path.relpath(leaf, vdir)
                for leaf, values in _leaf_partitions(
                    vdir, len(self.partition_by)
                )
                if values not in touched
            ]
            n_linked = sum(
                1
                for r in all_rels
                if any(r.startswith(u + os.sep) for u in untouched_leaves)
            )
            self._commit_touched(
                scoped, touched, op="purge", base=base,
                dv_df=dv.limit(0), dv_state="empty",
            )
            return {
                "files_rewritten": len(all_rels) - n_linked,
                "files_linked": n_linked,
                "purged_keys": n_keys,
            }
        info = self._prunable_key_files(dv, base, pinned_distinct=True)
        if info is not None:
            kept_abs, keep_rels, schema = info
        else:
            # band-matching unavailable: every file may hold a
            # tombstoned row — rewrite them all (a plain compact-sized
            # cost, still clearing the vector)
            kept_abs = [os.path.join(vdir, r) for r in all_rels]
            keep_rels = []
            schema = self._version_schema(base)
        rewritten = self._read_files(spark, base, kept_abs, schema)  # DV-filtered
        self._commit_linked_files(
            rewritten if kept_abs else None,
            keep_rels,
            op="purge",
            base=base,
            dv_df=dv.limit(0),  # explicit clear, never carry
            dv_state="empty",
        )
        return {
            "files_rewritten": len(kept_abs),
            "files_linked": len(keep_rels),
            "purged_keys": n_keys,
        }

    def _prunable_key_files(
        self, keyed_df: DataFrame, base: Optional[str],
        pinned_distinct: bool = False,
    ):
        """The shared planning step of file-pruned merge/delete:
        collect the DISTINCT (driver-bounded) first-key values of
        ``keyed_df`` and match them against the ``_STATS`` per-file
        bands. Returns ``(kept_abs_paths, keep_rel_paths,
        sidecar_schema)`` or None when pruning is inapplicable (no
        sidecar / unprunable key type / NULL or NaN keys / key set
        over the 64k cap / nothing skippable).

        ``pinned_distinct``: the caller guarantees ``keyed_df`` is
        already DISTINCT on the key tuple and MATERIALIZED (the
        delete path pins ``keys_df.distinct().localCheckpoint()``).
        Then one bounded ``limit(cap+1).collect()`` replaces the
        two-action probe (map-only pre-check + distinct shuffle): the
        NULL/NaN test runs driver-side on ≤ cap+1 collected scalars,
        and an over-cap key set stops at the limit instead of paying
        a count — one Spark action instead of two per delete."""
        if self.fmt not in ("parquet", "orc") or base is None:
            return None
        from a2b_spark.storage import stats as _stats

        vdir = os.path.join(self.path, base)
        k = self.key_cols[0]
        if k not in keyed_df.columns:
            return None
        ktype = dict(keyed_df.dtypes).get(k)
        if ktype not in self._PRUNABLE_KEY_TYPES:
            return None
        # per-file matching needs the key SET — a [min,max] band is
        # useless the moment a batch mixes low-key updates with a
        # high-key insert (the band then spans the whole table). 64k
        # scalar keys is a few MB driver-side.
        cap = 1 << 16
        if pinned_distinct:
            # distinct first-key values via a bounded fetch over the
            # pinned blocks; multi-column keys still dedupe the first
            # key inside the same single action
            src = keyed_df.select(k)
            if len(self.key_cols) > 1:
                src = src.distinct()
            vals = [r[0] for r in src.limit(cap + 1).collect()]
            if not vals or len(vals) > cap:
                return None
            # NULL/NaN keys merge via eqNullSafe but never fall in a
            # [min,max] band (and NaN sorts above every value yet
            # parquet stats ignore it) — driver-side test on ≤ cap+1
            # scalars replaces the map-only pre-check action
            if any(x is None or (isinstance(x, float) and x != x) for x in vals):
                return None
            keys = vals
        else:
            # cheap one-pass pre-check first: a bulk-load-sized batch must
            # not pay a distinct shuffle just to discover it exceeds the cap
            unbandable = F.col(k).isNull()
            if ktype in ("float", "double"):
                # NaN sorts above every value yet parquet stats ignore it;
                # NULL keys merge via eqNullSafe but never fall in a band
                unbandable = unbandable | F.isnan(F.col(k))
            pre = keyed_df.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(unbandable.cast("long")).alias("bad"),
            ).first()
            if not pre["n"] or pre["bad"] or pre["n"] > 4 * cap:
                return None
            keys = [
                r[0] for r in keyed_df.select(k).distinct().limit(cap + 1).collect()
            ]
            if not keys or len(keys) > cap:
                return None
        kept_rels = self._files_matching_keys(vdir, k, sorted(keys))
        if kept_rels is None:
            return None
        all_rels = _stats._data_files(vdir)
        if len(kept_rels) >= len(all_rels):
            return None  # nothing skippable — plain path, same cost
        kept_abs = [os.path.join(vdir, rel) for rel in sorted(kept_rels)]
        keep_rels = [rel for rel in all_rels if rel not in kept_rels]
        return kept_abs, keep_rels, self._version_schema(base)

    def _read_files(
        self, spark: SparkSession, base: str, abs_paths, schema,
        dv: Optional[DataFrame] = _UNSET_BASE,
    ):
        """Read exactly ``abs_paths`` of version ``base`` under the
        sidecar schema (empty typed frame when no file matched — a
        pure-insert batch). The version's deletion vector applies here
        too: these reads feed REWRITES (pruned merge/delete), and an
        unfiltered read would physically resurrect tombstoned rows
        into the new files. ``dv`` forwards to :meth:`_apply_dv` —
        callers that already loaded the vector skip the second read."""
        vdir = os.path.join(self.path, base)
        if not abs_paths:
            if schema is None:
                schema = self.read(spark, version=base).schema
            return spark.createDataFrame([], schema)
        reader = (
            spark.read.format(self.fmt)
            .options(**_FORMAT_OPTIONS[self.fmt])
            .option("basePath", vdir)
        )
        if schema is not None:
            reader = reader.schema(schema)
        return self._apply_dv(spark, reader.load(abs_paths), vdir, dv=dv)

    @staticmethod
    def _files_matching_keys(vdir: str, key: str, keys_sorted: list):
        """Relative data-file paths whose ``_STATS`` [min,max] band for
        ``key`` contains at least one of ``keys_sorted`` — files with
        missing/unusable stats are always kept (may-match). Returns
        None when the sidecar lacks the key column entirely (no
        pruning possible). One bisect per file entry."""
        from bisect import bisect_left

        from a2b_spark.storage import stats as _stats

        tbl = _stats.load_stats_arrow(vdir)
        if tbl is None:
            return None
        spec = _stats._stat_col_specs(tbl.schema.names).get(key)
        if spec is None:
            return None
        rels = tbl.column("rel").to_pylist()
        mins = tbl.column(spec["min"]).to_pylist()
        maxs = tbl.column(spec["max"]).to_pylist()
        kept = set()
        for rel, mn, mx in zip(rels, mins, maxs):
            if mn is None or mx is None:
                kept.add(rel)  # no usable stats: may match
                continue
            try:
                i = bisect_left(keys_sorted, mn)
            except TypeError:
                return None  # incomparable key/stat types: no pruning
            if i < len(keys_sorted) and keys_sorted[i] <= mx:
                kept.add(rel)
        return kept

    def _commit_linked_files(
        self,
        df: Optional[DataFrame],
        keep_rels,
        op: str,
        base: str,
        cdf_df: Optional[DataFrame] = None,
        dv_df: Optional[DataFrame] = None,
        dv_state: Optional[str] = None,
    ) -> None:
        """File-granular sibling of :meth:`_commit_touched` for
        UNPARTITIONED tables: write ``df`` as this commit's new files
        and hard-link every ``keep_rels`` data file from ``base``
        (metadata-only). Constraint observation rides the staging
        write; stats entries for linked files reuse the base sidecar
        by inode. ``dv_df``: this commit's deletion vector — None
        CARRIES the base's vector unchanged (the hardlinked files
        still hold the tombstoned bytes); a DataFrame REPLACES it
        (written when non-empty, cleared when empty). ``df=None``: a
        NO-NEW-ROWS commit (a deletion-vector delete) — every data
        file hardlinks, nothing is staged through Spark (whose writer
        emits a schema-preserving empty part file even for an empty
        frame), constraints trivially hold, and the schema sidecar
        carries forward from the base."""
        old_dir = os.path.join(self.path, base)
        version = self._next_version()
        tmp_target = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}")
        if df is None:
            os.makedirs(tmp_target)
        else:
            if op == "purge":  # layout-only rewrite of validated data
                _check_constraints = lambda: None  # noqa: E731
            else:
                df, _check_constraints = self._constraint_observation(df, base)
            with _stats_friendly_timestamps(df.sparkSession):
                (
                    df.write.mode("overwrite")
                    .format(self.fmt)
                    .options(**_FORMAT_OPTIONS[self.fmt])
                    .save(tmp_target)
                )
            try:  # BEFORE hard-linking untouched files or the flip
                _check_constraints()
            except ConstraintViolation:
                shutil.rmtree(tmp_target, ignore_errors=True)
                raise
        self._write_cdf(tmp_target, cdf_df)
        self._write_added_sidecar(tmp_target)  # before the hardlinks
        for rel in keep_rels:
            dst = os.path.join(tmp_target, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.link(os.path.join(old_dir, rel), dst)
        import json as _json

        contents = {COMMIT_INFO: self._commit_info(op)}
        if df is not None:
            contents[SCHEMA] = _json.dumps(df.schema.jsonValue())
        for fn, content in contents.items():
            with open(os.path.join(tmp_target, fn), "w") as f:
                f.write(content)
        self._write_stats_sidecar(tmp_target, base)
        self._carry_forward_metadata(tmp_target, base)
        self._stage_dv(tmp_target, base, dv_df, dv_state=dv_state)
        self._claim_version_dir(tmp_target, version)
        self._commit(version, base=base)

    def _stage_dv(
        self,
        tmp_target: str,
        base: Optional[str],
        dv_df: Optional[DataFrame],
        dv_state: Optional[str] = None,
    ) -> None:
        """Stage this commit's deletion vector: ``dv_df=None`` carries
        the base version's ``_dv/`` (small file copy); a DataFrame
        replaces it — written as one parquet file when non-empty,
        nothing (vector cleared) when empty. ``dv_state``: caller's
        knowledge of the frame's emptiness ('empty' / 'nonempty') —
        skips the ``isEmpty`` probe action; None runs the probe."""
        dst = os.path.join(tmp_target, DV_DIR)
        if dv_df is None:
            src = os.path.join(self.path, base or "", DV_DIR)
            if base and os.path.isdir(src):
                shutil.copytree(src, dst)
            return
        if dv_state == "empty":
            return
        if dv_state != "nonempty" and dv_df.isEmpty():
            return
        dv_df.coalesce(1).write.parquet(dst)
    def compact(
        self,
        spark: SparkSession,
        target_file_bytes: int = 128 << 20,
        min_files: int = 2,
        cluster_by: Sequence[str] | None = None,
        cluster_mode: str = "range",
    ) -> dict:
        """Bin-pack small files (the OPTIMIZE of Delta/Iceberg): rewrite
        any partition holding ``min_files``-or-more data files into
        ``ceil(bytes / target_file_bytes)`` files; partitions already
        compact are hard-linked, not rewritten. Incremental keyed merges
        add a file per commit, so long-lived tables trend toward many
        tiny files — death by task-scheduling and footer overhead at
        100 TB (a 1-row parquet file still costs a task + a footer
        read). Data is byte-identical; the commit is a normal new
        version, so time travel retains the pre-compaction layout until
        vacuum.

        ``cluster_by``: the OPTIMIZE ZORDER analogue — ALSO re-layout
        the data so those columns' value ranges are DISJOINT across
        files (range repartition + within-file sort, lexicographic on
        the column tuple), which is what turns the ``_STATS``
        file-skipping sidecar from "never wrong" into "actually
        skips": after clustering, a point or range predicate on the
        leading cluster column prunes to O(matching files) instead of
        reading everything. Clustering REWRITES every partition
        (changing layout is the point — ``min_files`` only gates the
        no-cluster fast path), still sizing file counts by bytes.
        ``cluster_mode``: ``"range"`` (default) lays files out
        lexicographically on the column tuple — exact skipping on the
        LEADING column, prefix benefits on the rest. ``"zorder"``
        bit-interleaves the columns (storage/zorder.py) so each file
        covers a small hyper-rectangle and predicates on ANY clustered
        column prune — the OPTIMIZE ZORDER BY semantics. Single-column
        cluster_by should stay on "range" (interleaving one column is
        just a coarser range).

        Per-partition output file counts are computed driver-side from
        the leaf directory listing (O(file count), no data read) and
        applied via a ``__bucket`` column — hash of the key columns mod
        that partition's target count — so one shuffle produces exactly
        the target layout. Returns
        ``{"partitions_rewritten", "files_before", "files_after"}``.
        """
        import math

        cur = self.current_version()
        empty = {"partitions_rewritten": 0, "files_before": 0, "files_after": 0}
        if cur is None:
            return empty
        vdir = os.path.join(self.path, cur)

        def _data_files(d: str) -> list[str]:
            return [
                os.path.join(d, f)
                for f in os.listdir(d)
                if not f.startswith(("_", ".")) and os.path.isfile(os.path.join(d, f))
            ]

        if cluster_mode not in ("range", "zorder"):
            raise ValueError(
                f"cluster_mode must be 'range' or 'zorder', got {cluster_mode!r}"
            )
        if cluster_by:
            cur_df = self.read(spark, version=cur)
            missing = [c for c in cluster_by if c not in cur_df.columns]
            if missing:
                raise ValueError(f"cluster_by columns not in table: {missing}")

        def _cluster_layout(df: DataFrame, n: int, lead: Sequence[str]):
            """Range-partition + within-file sort on the cluster layout
            key: the raw column tuple ("range") or the interleaved-bit
            z-value ("zorder"). ``lead``: partition columns, kept ahead
            of the key so each leaf's rows stay contiguous."""
            if cluster_mode == "zorder":
                from a2b_spark.storage.zorder import zorder_key

                # collision-proof temp name: withColumn REPLACES an
                # existing column, so a user column literally named
                # "__z" would be silently destroyed by the rewrite
                zc = f"__z_{uuid.uuid4().hex[:8]}"
                df = df.withColumn(zc, zorder_key(df, list(cluster_by)))
                out = df.repartitionByRange(
                    max(1, n), *lead, zc
                ).sortWithinPartitions(*lead, zc)
                return out.drop(zc)
            return df.repartitionByRange(
                max(1, n), *lead, *cluster_by
            ).sortWithinPartitions(*lead, *cluster_by)

        if not self.partition_by:
            files = _data_files(vdir)
            if cluster_by:
                if not files:
                    return empty
                n = max(
                    1,
                    math.ceil(sum(os.path.getsize(f) for f in files) / target_file_bytes),
                )
                clustered = _cluster_layout(
                    self.read(spark, version=cur), n, lead=()
                )
                self.overwrite(clustered, op="compact", base=cur)
                return {
                    "partitions_rewritten": 1,
                    "files_before": len(files),
                    "files_after": n,
                }
            if len(files) < min_files:
                return {**empty, "files_before": len(files), "files_after": len(files)}
            n = max(1, math.ceil(sum(os.path.getsize(f) for f in files) / target_file_bytes))
            if n >= len(files):
                return {**empty, "files_before": len(files), "files_after": len(files)}
            self.overwrite(self.read(spark, version=cur).repartition(n), op="compact", base=cur)
            return {
                "partitions_rewritten": 1,
                "files_before": len(files),
                "files_after": n,
            }

        # partitioned: plan per-leaf target counts from the listing
        plan: dict[tuple, int] = {}
        before = after = 0
        for leaf, values in _leaf_partitions(vdir, len(self.partition_by)):
            files = _data_files(leaf)
            before += len(files)
            n = max(
                1, math.ceil(sum(os.path.getsize(f) for f in files) / target_file_bytes)
            )
            if cluster_by:
                # re-layout rewrites every non-empty partition
                if files:
                    plan[values] = n
                    after += n
            elif len(files) >= min_files and n < len(files):
                plan[values] = n
                after += n
            else:
                after += len(files)
        if not plan:
            return {**empty, "files_before": before, "files_after": before}

        current = self.read(spark, version=cur)  # pinned snapshot
        touched_df = current.filter(self._partition_filter(set(plan)))
        if cluster_by:
            # contiguous (partition, cluster) ranges: partitionBy splits
            # each range task by partition value, so a leaf's rows land
            # in ~(leaf share of rows)·N contiguous files, each covering
            # a disjoint cluster-column range; within-file sort keeps
            # row groups tight for the footer stats
            total_n = sum(plan.values())
            clustered = _cluster_layout(
                touched_df, total_n, lead=self.partition_by
            )
            self._commit_touched(clustered, set(plan), op="compact", base=cur)
            return {
                "partitions_rewritten": len(plan),
                "files_before": before,
                "files_after": after,
            }
        # per-partition bucket count via a literal map (partition lists
        # are low-cardinality by design — same contract as
        # _touched_partitions)
        sep = "\x00"
        pkey = F.concat_ws(sep, *[F.col(c).cast("string") for c in self.partition_by])
        nmap = F.create_map(
            *[
                F.lit(x)
                for vals, n in plan.items()
                for x in (sep.join(vals), n)
            ]
        )
        bucketed = touched_df.withColumn(
            "__bucket",
            F.pmod(F.xxhash64(*[F.col(c) for c in self.key_cols]), nmap[pkey]),
        ).repartition(*self.partition_by, "__bucket")
        self._commit_touched(bucketed.drop("__bucket"), set(plan), op="compact", base=cur)
        return {
            "partitions_rewritten": len(plan),
            "files_before": before,
            "files_after": after,
        }

    # ------------------------------------------------------------ vacuum
    def vacuum(self, keep: int | None = None, older_than=None) -> None:
        """Trim committed history to the newest ``keep`` versions.

        ``older_than`` (a ``datetime.timedelta`` or seconds) switches
        to TIME-BASED retention — the operational contract a CDC
        consumer needs (examples/lakehouse_cdc.py: a count-based window
        silently vacuums commits an availableNow stream with lag has
        not read yet; "newer than the consumer's longest downtime"
        is statable, "fewer than N commits behind" is not): only
        committed versions whose COMMIT TIMESTAMP (``_COMMIT_INFO``;
        dir mtime for pre-feature versions, unknown age keeps) is
        older than the cutoff are trimmed. ``keep`` then defaults to 1
        (purely time-based; pass both for the intersection — a version
        survives if EITHER guard holds). The automatic per-commit
        vacuum stays count-based (``self.retention``); tables serving
        lagging consumers should set ``retention`` high and run
        ``vacuum(older_than=...)`` on their own schedule.

        Counts only COMMITTED versions (the same ``d <= _CURRENT`` rule
        as :meth:`versions`): a crashed/mid-commit writer's orphan dir
        (newer than the marker) must not occupy a retention slot —
        otherwise it would silently push committed time-travel history,
        or at keep=1 the live version itself, out of the window. Orphan
        dirs newer than ``_CURRENT`` are deleted only after the same
        grace period as staging dirs — a CONCURRENT writer sits between
        ``_claim_version_dir`` and the marker flip for a moment, and an
        ungraced vacuum there would delete the dir the marker is about
        to point at, bricking the table (round-9 review finding). The
        live version is always preserved."""
        import time as _time

        if keep is None:
            keep = 1 if older_than is not None else self.retention
        if not os.path.isdir(self.path):
            return
        cur = self.current_version()
        all_dirs = sorted(d for d in os.listdir(self.path) if d.startswith("v_"))
        if cur is None:
            # version dirs with no/empty _CURRENT marker = a damaged
            # table (marker lost in a partial copy), not orphans —
            # deleting here would turn a recoverable state (rewrite the
            # marker by hand) into permanent data loss. No-op.
            return
        cutoff = _time.time() - 3600
        committed = [d for d in all_dirs if d <= cur]
        orphans = []
        for d in all_dirs:
            if d <= cur:
                continue
            try:
                if os.path.getmtime(os.path.join(self.path, d)) < cutoff:
                    orphans.append(d)  # crashed writer's leftover
            except OSError:
                pass  # vanished mid-scan (the writer just claimed it)
        doomed = committed[:-keep] if keep else committed
        if older_than is not None:
            seconds = (
                older_than.total_seconds()
                if hasattr(older_than, "total_seconds")
                else float(older_than)
            )
            ts_cutoff = _time.time() - seconds
            # trim only the CONTIGUOUS oldest prefix: stop at the first
            # version failing the age test (non-monotone commit
            # timestamps — a clock step, an unreadable _COMMIT_INFO
            # falling back to a fresh mtime — must never punch a hole
            # in retained history, which would wedge every stream and
            # table_changes range crossing it)
            aged = []
            for d in doomed:
                age = self._commit_ts_epoch(d)
                if age is None or age >= ts_cutoff:
                    break
                aged.append(d)
            doomed = aged
        for d in doomed + orphans:
            if d == cur:
                continue
            shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)
        # crashed writers leave .tmp-* staging dirs (never referenced
        # by the marker); reclaim them — but only STALE ones, because
        # vacuum runs at every commit and a concurrent writer's staging
        # dir may be mid-write (same grace-period rule as Delta's
        # uncommitted-file cleanup)
        import time as _time

        cutoff = _time.time() - 3600
        for d in os.listdir(self.path):
            if d.startswith(".tmp-"):
                p = os.path.join(self.path, d)
                try:
                    if os.path.getmtime(p) < cutoff:
                        shutil.rmtree(p, ignore_errors=True)
                except OSError:
                    pass

    def _commit_ts_epoch(self, version: str) -> Optional[float]:
        """A version's commit time as an epoch float — from its
        ``_COMMIT_INFO`` timestamp, falling back to dir mtime for
        pre-commit-info versions; None (= unknown age, never vacuum by
        time) when both are unreadable."""
        import datetime as _dt
        import json as _json

        info = os.path.join(self.path, version, COMMIT_INFO)
        try:
            with open(info) as f:
                ts = _json.loads(f.read()).get("ts")
            if ts:
                return _dt.datetime.fromisoformat(ts).timestamp()
        except (OSError, ValueError):
            pass
        try:
            return os.path.getmtime(os.path.join(self.path, version))
        except OSError:
            return None


def _unescape_hive(s: str) -> str:
    """Inverse of Hive/Spark ``escapePathName``: directory names encode
    special characters (``:``, ``%``, ``=``, ``#`` …) as ``%XX`` hex.
    Every comparison against actual column values (``_partition_filter``,
    ``_commit_touched``'s touched set, ``compact``'s plan keys) must use
    the UNESCAPED value — comparing the raw dir name silently selects
    zero rows for e.g. timestamp-string partitions (round-4 advice:
    data loss in compact, duplicate rows in partitioned merge/delete)."""
    if "%" not in s:
        return s
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "%" and i + 2 < len(s):
            try:
                out.append(chr(int(s[i + 1 : i + 3], 16)))
                i += 3
                continue
            except ValueError:
                pass  # not a hex escape: keep the literal '%'
        out.append(c)
        i += 1
    return "".join(out)


def _leaf_partitions(root: str, depth: int):
    """Yield (leaf_dir, partition_value_tuple) for a Hive-layout tree.
    Values are UNESCAPED (see :func:`_unescape_hive`) so they compare
    equal to ``cast('string')`` of the partition columns."""
    stack = [(root, ())]
    while stack:
        d, vals = stack.pop()
        if len(vals) == depth:
            yield d, vals
            continue
        for name in os.listdir(d):
            sub = os.path.join(d, name)
            if os.path.isdir(sub) and "=" in name:
                stack.append(
                    (sub, vals + (_unescape_hive(name.split("=", 1)[1]),))
                )
