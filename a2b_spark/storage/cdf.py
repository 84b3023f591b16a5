"""Change data feed over VersionedParquetTable history — the
``table_changes`` analogue of Delta CDF / Iceberg incremental reads.

Two consumption modes:

- :func:`table_changes` (batch): the per-commit key-level diff across a
  RANGE of retained versions — one ``snapshot_diff`` per consecutive
  version pair, tagged ``_commit_version``. Fully general (insert/
  update/delete over any write op), distributed, output bounded by
  churn. ``with_rows=True`` attaches the after-image payload for
  inserts/updates (deletes have none, their payload columns are NULL).

- :class:`VersionAppendsDataSource` (streaming): a Spark 4 PYTHON
  streaming data source (``spark.dataSource.register`` +
  ``readStream.format("a2b_table_appends")``) whose offsets are the
  table's committed version numbers. Each micro-batch reads only the
  FILES ADDED by the new commits — the hardlink layout makes "new
  rows" literally "new inodes", so the planner ships one InputPartition
  per new file and the work distributes like any file source.
  APPEND-ONLY tables (every commit op "append"/"overwrite" initial
  load): a merge/delete/retract commit rewrites partitions (old rows in
  new files) and raises rather than silently double-reading;
  ``compact``/``vacuum`` commits rewrite LAYOUT only and are skipped.
  This is the streaming twin of the epoch-partitioned history pattern
  (streaming/neardup.py) — insert-only appends are exactly what it
  produces.

Offsets are ``{"version": n}`` with ``n`` the monotone
``current_version_number`` (never reset by vacuum). A checkpoint
older than the retention window raises a contextual error instead of
silently skipping lost commits.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from a2b_spark.storage.diff import align_to_after as _align_to
from a2b_spark.storage.diff import attach_after_image as _attach_after_image
from a2b_spark.storage.diff import snapshot_diff
from a2b_spark.storage.table import (
    CDF_DIR,
    COMMIT_INFO,
    LAYOUT_ONLY_OPS,
    SCHEMA,
    VersionedParquetTable,
    _unescape_hive,
)

# commit ops that change layout/metadata, not logical row content
_LAYOUT_ONLY_OPS = LAYOUT_ONLY_OPS
_APPEND_OPS = {"append", "overwrite"}


def table_changes(
    table: VersionedParquetTable,
    spark: SparkSession,
    from_version: Optional[str] = None,
    to_version: Optional[str] = None,
    with_rows: bool = False,
) -> DataFrame:
    """Key-level changes for every commit in ``(from_version,
    to_version]`` (defaults: oldest retained → current). Output:
    key columns + ``change`` ∈ {insert, delete, update} +
    ``_commit_version`` (int). ``with_rows`` left-joins the after-image
    from each commit's own snapshot (deletes keep NULL payloads)."""
    versions = table.versions()
    if not versions:
        raise ValueError(f"table {table.path} has no committed versions")
    if to_version is None:
        to_version = table.current_version()
    if from_version is None:
        from_version = versions[0]
    for v in (from_version, to_version):
        if v not in versions:
            raise ValueError(
                f"version {v!r} not retained at {table.path}; "
                f"available: {versions}"
            )
    lo, hi = versions.index(from_version), versions.index(to_version)
    if hi <= lo:
        raise ValueError(
            f"empty version range ({from_version!r} → {to_version!r}]"
        )
    out = None
    for i in range(lo + 1, hi + 1):
        prev_v, cur_v = versions[i - 1], versions[i]
        if _commit_op(os.path.join(table.path, cur_v)) in _LAYOUT_ONLY_OPS:
            continue  # provably empty diff: skip the table-sized join
        before = table.read(spark, version=prev_v)
        after = table.read(spark, version=cur_v)
        before = _align_to(before, after)
        d = snapshot_diff(before, after, table.key_cols).withColumn(
            "_commit_version",
            F.lit(VersionedParquetTable._parse_version_number(cur_v)).cast("int"),
        )
        if with_rows:
            d = _attach_after_image(d, after, table.key_cols)
        # allowMissingColumns: a range spanning an ADD-COLUMN evolution
        # has per-commit after-images with different column sets — the
        # pre-evolution commits' rows null-fill the new column (plain
        # unionByName raises NUM_COLUMNS_MISMATCH on exactly the
        # cross-evolution ranges _align_to exists for)
        out = d if out is None else out.unionByName(d, allowMissingColumns=True)
    if out is None:
        # the whole range was layout-only commits (compact/constraint/
        # evolution metadata): an EMPTY frame with the contract schema,
        # never None — callers chain .filter()/.show()
        after = table.read(spark, version=to_version).limit(0)
        out = snapshot_diff(after, after, table.key_cols).withColumn(
            "_commit_version", F.lit(0).cast("int")
        )
        if with_rows:
            out = _attach_after_image(out, after, table.key_cols)
    return out






class TableChangesStream:
    """Streaming twin of batch :func:`table_changes` — Delta-CDF parity
    for tables that REWRITE (merge / delete_keys / overwrite), which the
    appends source rejects by contract.

    Each call to :meth:`process_available` delivers every not-yet-seen
    commit's keyed diff (key cols + ``change`` + ``_commit_version``,
    plus the after-image under ``with_rows=True``) to a
    foreachBatch-style handler ``handler(df, commit_version)``, in
    commit order, advancing an atomic offset file AFTER the handler
    returns. Semantics match ``foreachBatch``: at-least-once with
    replay of at most the last in-flight commit after a crash, so
    handlers writing keyed sinks are idempotent under replay. A
    restart (new instance, same ``checkpoint_dir``) resumes from the
    stored offset; a vacuumed gap raises instead of silently skipping
    commits — the same contract as the appends source.

    Scale shape: one distributed ``snapshot_diff`` (full-outer join on
    the key, both sides column-pruned) per commit; output bounded by
    that commit's churn. Layout-only commits (compact) advance the
    offset without a join. The very first commit diffs against the
    empty frame, so an initial load streams as pure inserts — batch
    ``table_changes`` can express that only when version 1 is still
    retained, and so can this (otherwise the gap raises).
    """

    def __init__(
        self,
        table: VersionedParquetTable,
        spark: SparkSession,
        checkpoint_dir: str,
        with_rows: bool = False,
        start_version: int = 0,
    ):
        self.table = table
        self.spark = spark
        self.with_rows = with_rows
        self._start = int(start_version)
        os.makedirs(checkpoint_dir, exist_ok=True)
        self._offset_path = os.path.join(checkpoint_dir, "a2b_changes_offset.json")

    def last_processed(self) -> int:
        """Stored offset, or ``start_version`` when none exists yet.
        Only a MISSING offset file means a fresh stream — a transient
        read error (EACCES/EIO) or corrupt content must raise, not
        silently rewind to the start and re-deliver the whole retained
        history to the handler."""
        try:
            with open(self._offset_path) as f:
                return int(json.load(f)["version"])
        except FileNotFoundError:
            return self._start

    def _store(self, n: int) -> None:
        tmp = self._offset_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": n}, f)
        os.replace(tmp, self._offset_path)

    def process_available(self, handler) -> list[int]:
        """Run ``handler(diff_df, commit_version)`` for every commit
        newer than the stored offset; returns the versions whose diffs
        were delivered (layout-only commits are skipped silently)."""
        last = self.last_processed()
        cur = self.table.current_version_number() or 0
        if cur <= last:
            return []
        retained = {
            VersionedParquetTable._parse_version_number(v): v
            for v in self.table.versions()
        }
        missing = [n for n in range(last + 1, cur + 1) if n not in retained]
        if missing:
            raise ValueError(
                f"commits {missing} at {self.table.path} were vacuumed past "
                "the retention window; restart from a fresh checkpoint (or "
                "raise the table's retention)"
            )
        if last > 0 and last not in retained:
            raise ValueError(
                f"predecessor commit v{last} at {self.table.path} was "
                "vacuumed; the next diff cannot be derived — restart from "
                "a fresh checkpoint (or raise the table's retention)"
            )
        delivered: list[int] = []
        for n in range(last + 1, cur + 1):
            vdir = os.path.join(self.table.path, retained[n])
            if _commit_op(vdir) in _LAYOUT_ONLY_OPS:
                self._store(n)
                continue
            after = self.table.read(self.spark, version=retained[n])
            before = (
                _align_to(
                    self.table.read(self.spark, version=retained[n - 1]), after
                )
                if (n - 1) in retained
                else after.limit(0)  # first commit: diff vs empty
            )
            d = snapshot_diff(before, after, self.table.key_cols).withColumn(
                "_commit_version", F.lit(n).cast("int")
            )
            if self.with_rows:
                d = _attach_after_image(d, after, self.table.key_cols)
            handler(d, n)
            self._store(n)
            delivered.append(n)
        return delivered


def _commit_op(vdir: str) -> Optional[str]:
    p = os.path.join(vdir, COMMIT_INFO)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            return json.load(f).get("op")
    except (OSError, ValueError):
        return None


def _data_files_with_ino(vdir: str) -> dict[str, int]:
    out = {}
    from a2b_spark.storage.stats import keep_data_dir

    for root, dirs, files in os.walk(vdir):
        dirs[:] = [d for d in dirs if keep_data_dir(d)]
        for fn in files:
            if fn.startswith(("_", ".")):
                continue
            p = os.path.join(root, fn)
            out[os.path.relpath(p, vdir)] = os.stat(p).st_ino
    return out


def _new_files(prev_dir: Optional[str], cur_dir: str) -> list[str]:
    """Files of ``cur_dir`` that are NOT hardlinks of a predecessor
    file — i.e. this commit's appended rows (the hardlink layout makes
    inode identity the exact 'unchanged' signal)."""
    cur = _data_files_with_ino(cur_dir)
    prev = _data_files_with_ino(prev_dir) if prev_dir else {}
    prev_inos = set(prev.values())
    return sorted(
        os.path.join(cur_dir, rel)
        for rel, ino in cur.items()
        if ino not in prev_inos
    )


def _current_table_schema(path: str):
    """The table's CURRENT logical schema via the one sidecar resolver
    (``_version_schema`` — handles the pre-round-5 table-root sidecar
    too; a bare per-version open crashed on legacy tables)."""
    t = VersionedParquetTable(path, key_cols=())
    cur = t.current_version()
    if cur is None:
        raise ValueError(f"no committed versions at {path}")
    schema = t._version_schema(cur)
    if schema is None:
        raise ValueError(f"no _SCHEMA sidecar for {cur!r} at {path}")
    return schema


def _parse_part_values(rel: str) -> dict:
    """Hive-style {col: unescaped value} from a data file's RELATIVE
    path segments (``col=value``). Both the column NAME and the value
    are hive-escaped on disk — an escaped key would never match
    field.name and the column would silently null-fill (round-8 bug);
    this is the one parser both streaming sources plan with."""
    pvals: dict = {}
    for seg in os.path.dirname(rel).split(os.sep):
        if "=" in seg:
            col, val = seg.split("=", 1)
            pvals[_unescape_hive(col)] = _unescape_hive(val)
    return pvals


def _sidecar_rels(vdir: str) -> Optional[set]:
    """The version's data-file relative paths from its ``_STATS``
    sidecar (one small columnar read) — None when no sidecar exists."""
    from a2b_spark.storage import stats as _stats

    tbl = _stats.load_stats_arrow(vdir)
    return None if tbl is None else set(tbl.column("rel").to_pylist())


def _added_rels(vdir: str) -> Optional[list]:
    """The commit's own record of its freshly-written data files (the
    ``_ADDED`` sidecar, present since round 10) — None on older
    histories or unreadable files, where the planner falls back to the
    full per-version map diff of :func:`_new_rels`."""
    import json as _json

    from a2b_spark.storage.table import ADDED

    try:
        with open(os.path.join(vdir, ADDED)) as f:
            v = _json.load(f)
    except (OSError, ValueError):
        return None
    if not isinstance(v, list) or not all(isinstance(r, str) for r in v):
        return None
    return sorted(v)


def _leaf_dirs(vdir: str) -> Optional[set]:
    """Leaf data directories of a version (from its ``_STATS`` file
    map; inode walk fallback) — the one O(version size) read that
    seeds the appends planner's RUNNING leaf set at window start."""
    rels = _sidecar_rels(vdir)
    if rels is None:
        rels = set(_data_files_with_ino(vdir))
    return {os.path.dirname(r) for r in rels}


def _new_rels(
    prev_dir: Optional[str], cur_dir: str, _cache: Optional[dict] = None
) -> tuple[list, set]:
    """(new relative paths of cur vs prev, prev's leaf-dir set) —
    planning primitive of the appends source. The sidecar path makes a
    C-commit drain O(C · sidecar) instead of O(C · accumulated
    partition dirs): every version dir holds ALL partitions of history
    (hardlinked), so per-commit os.walks are quadratic in commit count
    — the round-9 storage trajectory probe measured 31.8× wall at 8×
    commits before this. Append-only contract makes rel-path set diff
    ≡ inode diff (fresh partitions, unique part-file names); versions
    without a sidecar fall back to the exact inode walk."""
    def _rels(d):
        # a windowed drain reads each version's sidecar twice (as cur
        # of n, then prev of n+1) — the one-entry cache halves that
        if _cache is not None and _cache.get("dir") == d:
            return _cache["rels"]
        r = _sidecar_rels(d)
        if _cache is not None:
            _cache["dir"], _cache["rels"] = d, r
        return r

    # prev first, cur last: the cache then holds CUR when the next
    # iteration asks for it as its prev
    prev_rels = _rels(prev_dir) if prev_dir else set()
    cur_rels = _rels(cur_dir)
    if cur_rels is None or prev_rels is None:
        cur = _data_files_with_ino(cur_dir)
        prev = _data_files_with_ino(prev_dir) if prev_dir else {}
        prev_inos = set(prev.values())
        new = sorted(rel for rel, ino in cur.items() if ino not in prev_inos)
        prev_leaves = {os.path.dirname(rel) for rel in prev}
        return new, prev_leaves
    return sorted(cur_rels - prev_rels), {
        os.path.dirname(rel) for rel in prev_rels
    }


try:  # pyspark >= 4: python data source API
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    class _FilePartition(InputPartition):
        def __init__(
            self,
            path: str,
            commit_version: int,
            part_values: dict,
            const_cols: Optional[dict] = None,
        ):
            self.path = path
            self.commit_version = commit_version
            # hive-style {col: unescaped string value} parsed from the
            # file's directory segments — partitionBy stores partition
            # values ONLY in dir names, never in the files themselves
            self.part_values = part_values
            # planner-fixed constant string columns (e.g. the changes
            # source synthesizing change='insert' for an initial load)
            self.const_cols = const_cols or {}

    def _file_record_batches(partition: _FilePartition, return_type, tz: str):
        """Vectorized file read shared by both streaming sources:
        yields ``pyarrow.RecordBatch``es cast to the exact Arrow
        schema Spark expects — never per-row Python tuples (the worker
        passes RecordBatches straight through, so this path is the
        streaming feed's throughput floor). Columns absent from the
        file resolve, in order: ``_commit_version`` (plan constant),
        ``const_cols`` (plan constants), hive-style directory-segment
        values (``col=value``), NULL fill."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(return_type)
        # DATA files follow the table's format (ORC tables stream
        # their own .orc files on appends / initial loads); CHANGE
        # files under _cdf/ are always parquet (_write_cdf)
        is_orc = partition.path.endswith(".orc")
        if is_orc:
            import pyarrow.orc as _orc

            pf = _orc.ORCFile(partition.path)
            present = set(pf.schema.names)
        else:
            pf = pq.ParquetFile(partition.path)
            present = set(pf.schema_arrow.names)
        # pre-resolve each output field to (source, typed constant)
        consts: dict[str, object] = {}
        for field in arrow_schema:
            if field.name == "_commit_version":
                consts[field.name] = pa.scalar(
                    partition.commit_version, type=field.type
                )
            elif field.name not in present:
                raw = partition.const_cols.get(
                    field.name, partition.part_values.get(field.name)
                )
                if raw is None or raw == "__HIVE_DEFAULT_PARTITION__":
                    consts[field.name] = None  # null fill
                elif (
                    pa.types.is_timestamp(field.type)
                    and field.type.tz is not None
                ):
                    # arrow refuses to cast a zone-less timestamp
                    # STRING straight to a tz-aware type: parse
                    # naive, stamp the WRITER-session zone on
                    # (option "timezone", default UTC), then
                    # convert to the field's zone
                    naive = pc.cast(
                        pa.scalar(raw), pa.timestamp(field.type.unit)
                    )
                    zoned = pc.assume_timezone(naive, tz)
                    consts[field.name] = (
                        zoned
                        if zoned.type == field.type
                        else pc.cast(zoned, field.type)
                    )
                else:
                    consts[field.name] = pc.cast(pa.scalar(raw), field.type)
        read_cols = [f.name for f in arrow_schema if f.name in present]
        if is_orc:
            # one RecordBatch per stripe (writer-bounded stripe size —
            # the ORC analogue of the parquet 64k-row batch bound)
            chunks = (
                pf.read_stripe(i, columns=read_cols)
                for i in range(pf.nstripes)
            )
        else:
            chunks = pf.iter_batches(batch_size=1 << 16, columns=read_cols)
        for chunk in chunks:
            n = chunk.num_rows
            arrays = []
            for field in arrow_schema:
                if field.name in present:
                    col = chunk.column(field.name)
                    arrays.append(
                        col if col.type == field.type else col.cast(field.type)
                    )
                else:
                    c = consts[field.name]
                    arrays.append(
                        pa.nulls(n, type=field.type)
                        if c is None
                        else pa.repeat(c, n)
                    )
            yield pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)

    class _AppendsStreamReader(DataSourceStreamReader):
        def __init__(self, options):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("a2b_table_appends requires option 'path'")
            # Spark renders timestamp partition DIRECTORY names in the
            # WRITER's session timezone; the reader cannot recover it
            # from the path, so it is an option (IANA name, default
            # UTC — the storage layer's pinned convention). A mismatch
            # shifts streamed instants by the zone offset.
            self._tz = options.get("timezone", "UTC")
            # verbatim table handle, driver-side listing only
            self.table = VersionedParquetTable(self.path, key_cols=())
            start = options.get("startingversion")
            self._initial = int(start) if start is not None else 0
            mc = options.get("maxcommitspertrigger")
            self._max_commits = int(mc) if mc is not None else None
            self._cursor: Optional[int] = None  # last planned end offset
            from pyspark.sql import types as T

            base = _current_table_schema(self.path)
            self._return_type = T.StructType(
                base.fields + [T.StructField("_commit_version", T.IntegerType())]
            )

        def initialOffset(self) -> dict:
            return {"version": self._initial}

        def latestOffset(self) -> dict:
            """Rate limiting (Delta maxFilesPerTrigger analogue): with
            option maxCommitsPerTrigger=N a micro-batch advances at
            most N commits past the last PLANNED/COMMITTED offset. The
            Python DataSource API has no admission control (the engine
            never tells the reader its restored offset before asking
            for the latest one — latestOffset is argless and called
            FIRST), so the first batch of every run is UNBOUNDED;
            capping starts from the second batch. Capping the first
            batch against `startingversion` instead would permanently
            stall a restarted stream whose checkpoint sits past the
            cap."""
            return self._rate_limited_latest()

        def _rate_limited_latest(self) -> dict:
            n = int(self.table.current_version_number() or 0)
            if self._max_commits is None or self._cursor is None:
                return {"version": n}
            return {"version": min(n, self._cursor + self._max_commits)}

        def commit(self, end: dict) -> None:
            self._cursor = max(self._cursor or 0, int(end["version"]))

        def partitions(self, start: dict, end: dict):
            lo, hi = int(start["version"]), int(end["version"])
            self._cursor = max(self._cursor or 0, hi)
            if hi <= lo:
                return []
            retained = {
                VersionedParquetTable._parse_version_number(v): v
                for v in self.table.versions()
            }
            missing = [n for n in range(lo + 1, hi + 1) if n not in retained]
            if missing:
                raise ValueError(
                    f"commits {missing} at {self.path} were vacuumed past the "
                    "retention window; restart the stream from a fresh "
                    "checkpoint (or raise the table's retention)"
                )
            parts: list[_FilePartition] = []
            cache: dict = {}  # consecutive commits share a sidecar read
            # running leaf-dir set of the last processed version (the
            # append-only contract makes it monotone: files never
            # leave, compact keeps the leaf set) — seeded lazily from
            # ONE predecessor file-map read, advanced per commit by
            # its _ADDED dirs
            leaves: Optional[set] = None
            for n in range(lo + 1, hi + 1):
                vdir = os.path.join(self.path, retained[n])
                op = _commit_op(vdir)
                if op in _LAYOUT_ONLY_OPS:
                    continue
                if op is not None and (
                    op not in _APPEND_OPS
                    or (op == "overwrite" and n > 1)
                ):
                    # 'overwrite' is append-shaped ONLY as the initial
                    # load: a later overwrite REPLACES the table — its
                    # files may all land in fresh partitions (passing
                    # the stale-partition check) while silently
                    # deleting every previous row the stream already
                    # emitted; the sink would diverge with no error
                    raise ValueError(
                        f"commit {retained[n]} has op {op!r}: the appends "
                        "stream supports append-only tables (merge/delete/"
                        "non-initial overwrite rewrite or drop old rows); "
                        "use storage.cdf.table_changes for keyed diffs"
                    )
                prev_dir = (
                    os.path.join(self.path, retained[n - 1])
                    if (n - 1) in retained
                    else None
                )
                if prev_dir is None and (n - 1) > 0:
                    # without the predecessor snapshot, EVERY file of
                    # this version (all hardlinked history included)
                    # would look "new" — the exact double-read the
                    # module contract promises to raise on. The only
                    # commit with no predecessor by construction is
                    # the very first one (n-1 == 0).
                    raise ValueError(
                        f"predecessor commit v{n - 1} of {retained[n]} was "
                        "vacuumed past the retention window; its appended "
                        "files cannot be derived — restart the stream from "
                        "a fresh checkpoint (or raise the table's retention)"
                    )
                added = _added_rels(vdir)
                if added is not None:
                    # fast path: the commit recorded its own new files
                    # (_ADDED) — per-commit planning cost is O(new
                    # files), and the stale-partition check runs
                    # against a RUNNING leaf set seeded ONCE per window
                    # (one predecessor file-map read), so a C-commit
                    # drain is O(window start + total new files)
                    # instead of O(C²) sidecar entries
                    new_rels = added
                    if leaves is None:
                        leaves = _leaf_dirs(prev_dir) if prev_dir else set()
                else:
                    new_rels, prev_leaves = _new_rels(
                        prev_dir, vdir, _cache=cache
                    )
                    leaves = set(prev_leaves)  # resync after a fallback
                if prev_dir is not None:
                    # "new rows == new files" holds only when appends
                    # land in FRESH partitions (the epoch-partitioned
                    # insert-only pattern): appending into an existing
                    # partition — or any commit on an UNPARTITIONED
                    # table — rewrites old rows into the new files and
                    # would double-read them
                    stale = [
                        rel
                        for rel in new_rels
                        if os.path.dirname(rel) in leaves
                    ]
                    if stale:
                        raise ValueError(
                            f"commit {retained[n]} rewrote partition(s) that "
                            "already held data — the appends stream requires "
                            "appends into FRESH partitions (epoch-partitioned "
                            "insert-only tables, streaming/neardup.py "
                            "pattern); use storage.cdf.table_changes for "
                            "keyed diffs over rewriting tables"
                        )
                if leaves is not None:
                    leaves |= {os.path.dirname(rel) for rel in new_rels}
                for rel in new_rels:
                    parts.append(
                        _FilePartition(
                            os.path.join(vdir, rel), n, _parse_part_values(rel)
                        )
                    )
            return parts

        def read(self, partition: _FilePartition):
            """See :func:`_file_record_batches` (shared vectorized
            path); partition-column values come from the hive-style
            directory segments parsed at planning time."""
            return _file_record_batches(partition, self._return_type, self._tz)

    class VersionAppendsDataSource(DataSource):
        """``readStream.format("a2b_table_appends").option("path", …)``
        — streams each commit's appended rows with a
        ``_commit_version`` column. Register once per session:
        ``spark.dataSource.register(VersionAppendsDataSource)``."""

        @classmethod
        def name(cls) -> str:
            return "a2b_table_appends"

        def schema(self):
            from pyspark.sql import types as T

            path = self.options.get("path")
            if not path:
                raise ValueError("a2b_table_appends requires option 'path'")
            base = _current_table_schema(path)
            return T.StructType(
                base.fields + [T.StructField("_commit_version", T.IntegerType())]
            )

        def streamReader(self, schema):
            return _AppendsStreamReader(self.options)

    def _changes_return_type(path: str):
        """Current logical schema + ``change`` + ``_commit_version`` —
        the streaming twin of ``table_changes(with_rows=True)``."""
        from pyspark.sql import types as T

        base = _current_table_schema(path)
        clash = {"change", "_commit_version"} & {f.name for f in base.fields}
        if clash:
            raise ValueError(
                f"table data columns {sorted(clash)} collide with reserved "
                "CDF output columns; rename them before streaming changes"
            )
        return T.StructType(
            base.fields
            + [
                T.StructField("change", T.StringType()),
                T.StructField("_commit_version", T.IntegerType()),
            ]
        )

    class _ChangesStreamReader(DataSourceStreamReader):
        """Planner for ``a2b_table_changes``: offsets are commit
        version numbers; each commit in ``(start, end]`` contributes
        one InputPartition per CHANGE FILE written at commit time
        (``_cdf/`` — see ``VersionedParquetTable.enable_cdf``), so the
        read distributes like any file source and NO diff is derived
        at stream time. The initial commit (version 1) has no
        predecessor by construction: its DATA files stream directly as
        ``change='insert'`` — an initial load costs zero extra bytes
        (this also covers shallow clones, whose v1 hardlinks the
        source). Layout-only commits are skipped; a content commit
        WITHOUT change files (written before CDF was enabled) raises
        rather than silently dropping its rows; vacuumed gaps raise
        like the appends source."""

        def __init__(self, options):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("a2b_table_changes requires option 'path'")
            self._tz = options.get("timezone", "UTC")
            self.table = VersionedParquetTable(self.path, key_cols=())
            start = options.get("startingversion")
            self._initial = int(start) if start is not None else 0
            mc = options.get("maxcommitspertrigger")
            self._max_commits = int(mc) if mc is not None else None
            self._cursor: Optional[int] = None
            self._return_type = _changes_return_type(self.path)

        def initialOffset(self) -> dict:
            return {"version": self._initial}

        def latestOffset(self) -> dict:
            """See _AppendsStreamReader.latestOffset: same
            maxCommitsPerTrigger rate-limit contract."""
            return self._rate_limited_latest()

        def _rate_limited_latest(self) -> dict:
            n = int(self.table.current_version_number() or 0)
            if self._max_commits is None or self._cursor is None:
                return {"version": n}
            return {"version": min(n, self._cursor + self._max_commits)}

        def commit(self, end: dict) -> None:
            self._cursor = max(self._cursor or 0, int(end["version"]))

        def partitions(self, start: dict, end: dict):
            lo, hi = int(start["version"]), int(end["version"])
            self._cursor = max(self._cursor or 0, hi)
            if hi <= lo:
                return []
            retained = {
                VersionedParquetTable._parse_version_number(v): v
                for v in self.table.versions()
            }
            missing = [n for n in range(lo + 1, hi + 1) if n not in retained]
            if missing:
                raise ValueError(
                    f"commits {missing} at {self.path} were vacuumed past "
                    "the retention window; restart the stream from a fresh "
                    "checkpoint (or raise the table's retention)"
                )
            parts: list[_FilePartition] = []
            for n in range(lo + 1, hi + 1):
                vdir = os.path.join(self.path, retained[n])
                op = _commit_op(vdir)
                if op in _LAYOUT_ONLY_OPS:
                    continue
                cdf_dir = os.path.join(vdir, CDF_DIR)
                if os.path.isdir(cdf_dir):
                    for fn in sorted(os.listdir(cdf_dir)):
                        if fn.startswith(("_", ".")):
                            continue
                        parts.append(
                            _FilePartition(os.path.join(cdf_dir, fn), n, {})
                        )
                    continue
                if n == 1:
                    # initial load: every row is an insert — stream the
                    # data files themselves, no change files needed
                    for rel in sorted(_data_files_with_ino(vdir)):
                        parts.append(
                            _FilePartition(
                                os.path.join(vdir, rel),
                                n,
                                _parse_part_values(rel),
                                const_cols={"change": "insert"},
                            )
                        )
                    continue
                raise ValueError(
                    f"commit {retained[n]} at {self.path} has no change "
                    "files (CDF was not enabled when it was written); "
                    "start the stream at a later offset or rewrite history "
                    "with enable_cdf() in effect"
                )
            return parts

        def read(self, partition: _FilePartition):
            return _file_record_batches(partition, self._return_type, self._tz)

    class TableChangesDataSource(DataSource):
        """``readStream.format("a2b_table_changes").option("path", …)``
        — Structured-Streaming CDC over a REWRITING VersionedParquetTable
        (merge / delete / restore), Delta CDF's streaming read. Requires
        the table's change data feed (``enable_cdf()``); each
        micro-batch delivers the after-image rows + ``change`` ∈
        {insert, update, delete} + ``_commit_version``, read straight
        from the change files staged at commit time. Register once per
        session: ``spark.dataSource.register(TableChangesDataSource)``."""

        @classmethod
        def name(cls) -> str:
            return "a2b_table_changes"

        def schema(self):
            path = self.options.get("path")
            if not path:
                raise ValueError("a2b_table_changes requires option 'path'")
            return _changes_return_type(path)

        def streamReader(self, schema):
            return _ChangesStreamReader(self.options)

except ImportError:  # pragma: no cover - pyspark < 4 fallback
    VersionAppendsDataSource = None  # type: ignore[assignment]
    TableChangesDataSource = None  # type: ignore[assignment]
