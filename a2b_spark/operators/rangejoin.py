"""Range (interval) join — points matched to intervals that contain
them. Spark plans a bare `p BETWEEN s AND e` predicate as a broadcast
nested-loop (O(|points|·|intervals|)); the scale formulation bins the
range domain:

    point  -> bin(p)                       (1 row per point)
    interval -> explode bins(s..e)         ((e-s)/width + 1 rows)
    equi-join on (equi_keys..., bin)       (hash join, shuffles once)
    residual filter s <= p <= e            (drops same-bin non-overlaps)

Each true match shares exactly one bin (the point's), so no dedup pass
is needed. Pick ``bin_width`` ≈ the typical interval length: replication
factor stays ~2 while bins keep the join selective. This is the same
strategy DuckDB's native range join and Spark's (Databricks) range-join
hints use — here it's plain DataFrame algebra.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    equi_keys: Sequence[str] = (),
    bin_width: int | str = 3_600_000_000,
    max_bins_per_interval: int = 65_536,
) -> DataFrame:
    """Inner join of each point row to every interval row with
    ``start <= point <= end`` (and equal ``equi_keys``). Columns of both
    inputs are preserved; name collisions outside ``equi_keys`` are the
    caller's to resolve. ``bin_width`` is in the units of the point
    column (default: 1h in microseconds), or ``"auto"`` to derive it
    from the p95 interval length (one cheap aggregate) so replication
    stays ~2 without manual tuning.

    Blowup guard: the explode replicates each interval by
    span/bin_width rows, so one pathological interval (an open-ended
    sentinel date, a mis-unit timestamp) against a small width could
    emit millions of rows. Any interval spanning more than
    ``max_bins_per_interval`` bins raises at execution time (JVM-side
    ``raise_error``, no extra pass) naming the offending span — the
    caller either fixes the data or explicitly raises the cap."""
    equi = list(equi_keys)
    if bin_width != "auto" and (not isinstance(bin_width, int) or bin_width < 1):
        raise ValueError(f"bin_width must be a positive int or 'auto', got {bin_width!r}")
    if bin_width == "auto":
        # p95 interval length: wide enough that ≥95% of intervals
        # replicate ≤2×, robust to sentinel outliers (unlike max)
        w = intervals.agg(
            F.percentile_approx(
                F.col(end_col) - F.col(start_col), 0.95
            ).alias("w")
        ).first()["w"]
        bin_width = max(int(w or 1), 1)

    def b(c: str) -> Column:
        # floor division (floor, not truncation, so negative domains
        # bin consistently); double intermediate is exact below 2^53
        return F.floor(F.col(c) / F.lit(bin_width)).cast("long")

    # reversed intervals (end < start) must ALSO raise — and on the
    # raw endpoints, not n_bins < 1: a cross-bin reversal makes
    # sequence(start, stop) generate a DESCENDING |span|+1-element
    # explode, while a same-bin reversal (n_bins == 1) would silently
    # match nothing; both are the same data defect and get the same
    # error.
    n_bins = b(end_col) - b(start_col) + 1
    seq = F.when(
        (n_bins > F.lit(max_bins_per_interval))
        | (F.col(end_col) < F.col(start_col)),
        F.raise_error(
            F.format_string(
                "range_join: interval [%s, %s] spans %s bins at bin_width="
                + str(bin_width)
                + " (max_bins_per_interval="
                + str(max_bins_per_interval)
                + "); fix the data (reversed interval?), widen bin_width, or raise the cap",
                F.col(start_col).cast("string"),
                F.col(end_col).cast("string"),
                n_bins.cast("string"),
            )
        ).cast("array<bigint>"),
    ).otherwise(F.sequence(b(start_col), b(end_col)))
    p = points.withColumn("__bin", b(point_col))
    i = intervals.withColumn("__bin", F.explode(seq))
    joined = p.join(i, equi + ["__bin"]).filter(
        (F.col(start_col) <= F.col(point_col)) & (F.col(point_col) <= F.col(end_col))
    )
    return joined.drop("__bin")


def _hash60(key_col: str, salt: str) -> Column:
    """Salted top-60-bits-of-md5 as a non-negative long — the engine's
    oracle-parity hash idiom (DuckDB twin:
    ``CAST(('0x' || substring(md5(salt || key), 1, 15)) AS BIGINT)``),
    shared by every sampling/sharding operator so their cuts and
    orders are mutually consistent by construction."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")).cast("binary")),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")


def _bucket60(key_col: str, salt: str) -> Column:
    """100-bucket cut of :func:`_hash60`."""
    return _hash60(key_col, salt) % 100


def hash_sample(df: DataFrame, key_col: str, percent: int, salt: str = "") -> DataFrame:
    """Deterministic hash sampling: keep rows whose key hashes into the
    first ``percent`` of 100 buckets. Unlike ``df.sample`` this is
    stable across runs, engines, partitionings and cluster sizes — the
    property a training-data pipeline needs so a sample is reproducible
    and joinable (the same key always lands on the same side of the
    cut). Hash = top-60-bits-of-md5 (the engine's oracle-parity idiom),
    salted to decorrelate independent samples."""
    if not (0 <= percent <= 100):
        raise ValueError("percent must be in [0, 100]")
    return df.filter(_bucket60(key_col, salt) < percent)


def stratified_hash_sample(
    df: DataFrame, key_col: str, stratum_col: str, rates: dict[str, int], salt: str = ""
) -> DataFrame:
    """Per-stratum deterministic hash sampling: each stratum keeps rows
    whose key hashes into the first ``rates[stratum]`` of 100 buckets
    (strata absent from ``rates`` are dropped). The standard
    rebalancing move for skewed training corpora — downsample the
    dominant language/source, keep the tail — with hash_sample's
    reproducibility contract: stable across runs, engines and cluster
    sizes, and consistent per key (a key sampled at 20% is a subset of
    the same stratum at 50%).

    One scan, no shuffle: the rate lookup is a literal CASE over the
    stratum column, and the hash-threshold filter pushes down to the
    scan like any other predicate."""
    rate = None
    for stratum, pct in sorted(rates.items()):
        if not (0 <= pct <= 100):
            raise ValueError(f"rate for {stratum!r} must be in [0, 100]")
        cond = F.col(stratum_col) == stratum
        rate = F.when(cond, F.lit(pct)) if rate is None else rate.when(cond, F.lit(pct))
    rate = rate.otherwise(F.lit(0)) if rate is not None else F.lit(0)
    return df.filter(_bucket60(key_col, salt) < rate)


def weighted_hash_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str | Column,
    salt: str = "",
    resolution: int = 10_000,
) -> DataFrame:
    """Per-row weighted Bernoulli sampling, deterministic in the key:
    keep a row iff ``u(key) < weight``, where ``u`` is the engine's
    oracle-parity md5 uniform quantized to ``resolution`` buckets and
    ``weight`` is a per-row probability in [0, 1] (values outside are
    clamped; null weights drop the row).

    This is importance resampling for training data — keep high-quality
    documents with probability ~1 and low-quality ones at their score —
    with the same reproducibility contract as hash_sample: stable
    across runs, engines, partitionings and cluster sizes, and
    monotone in the weight (a row kept at weight w is kept at any
    w' >= w, so re-weighting never churns the kept set randomly).

    One scan, no shuffle; the filter is pure codegen and pushes down
    like any predicate."""
    if resolution < 1:
        raise ValueError("resolution must be >= 1")
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    clamped = F.least(F.greatest(w.cast("double"), F.lit(0.0)), F.lit(1.0))
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")).cast("binary")),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % resolution
    )
    return df.filter(u < clamped * resolution)


def frequency_cap(
    df: DataFrame,
    group_cols,
    id_col: str,
    cap: int,
    salt: str = "fc1",
    rank_col: str = "rk",
) -> DataFrame:
    """Per-domain frequency cap (the RefinedWeb/C4 move: no single
    domain may contribute more than ``cap`` documents to the training
    mix): keep at most ``cap`` rows per ``group_cols`` tuple, chosen
    by the salted md5 order over ``id_col`` with the id string as the
    tiebreak — a deterministic uniform draw, so the kept subset is
    reproducible across runs, engines, partitionings, and cluster
    sizes, and unbiased w.r.t. id ranges (a MIN(doc_id) cap would
    favor old documents). Output adds ``rank_col`` (1-based position
    in the group's kept order).

    NOT interchangeable with the streaming twin: this operator picks
    each domain's ``cap`` keepers by the salted draw over the WHOLE
    corpus (global knowledge a stream never has), while
    ``streaming/stateful.streaming_domain_quota`` admits the first
    ``cap`` ARRIVALS per domain. Both are correct cap policies, but on
    the same rows they generally keep DIFFERENT subsets —
    tests/test_multimodal_streaming.py::test_domaincap_batch_vs_streaming_divergence
    pins a frozen corpus where they disagree. Choose by semantics
    (unbiased reproducible draw vs ingest quota), not by engine.

    Scale shape: the salted two-phase top-k (operators/topk.py) —
    a hot domain (the 100 TB boilerplate-site case) reduces to
    ``salts * cap`` candidate rows on the map side before one tiny
    final window, never a single-task sort of the whole domain.
    DuckDB twin: ROW_NUMBER() OVER (PARTITION BY groups ORDER BY
    h60(salt || id), CAST(id AS VARCHAR)) <= cap over the shared
    top-60-bit-md5 idiom."""
    from a2b_spark.operators.topk import top_k_per_group

    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    # A NULL id would hash to NULL and sort NULLS FIRST in Spark but
    # NULLS LAST in DuckDB — a silently divergent kept set. Fail
    # loudly AT EXECUTION, riding the hash expression itself (the
    # shuffle_shards NULL-key contract; no extra validation scan).
    h = F.when(F.col(id_col).isNotNull(), _hash60(id_col, salt)).otherwise(
        F.raise_error(
            F.lit(
                f"frequency_cap: NULL value in id column {id_col!r} — "
                "the deterministic draw is undefined for NULL ids; "
                "filter or fill them first"
            )
        )
    )
    order = [h.asc(), F.col(id_col).cast("string").asc()]
    return top_k_per_group(df, list(group_cols), order, cap, rank_col=rank_col)
