"""Vector math over ``array<float|double>`` columns — Catalyst
higher-order functions only (zip_with / aggregate / transform), no
UDFs: dot products run inside whole-stage codegen.

Determinism: everything is computed in DOUBLE with a sequential
left-fold, matching the explicit formulas used in the DuckDB oracles
(same operand order → bit-identical IEEE results).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def as_double(vec) -> Column:
    v = vec if isinstance(vec, Column) else F.col(vec)
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """NULL (not an ANSI divide-by-zero error) when either vector has
    zero norm — callers treat no-direction vectors like null vectors."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def pair_cosine_raw() -> "callable":
    """Arrow-batched exact-fold cosine over two array<double> columns.
    Bit-identical to ``cosine()`` (same left-to-right IEEE-754 float64
    fold, one vectorized numpy add per dimension) at ~100× the speed of
    the interpreted higher-order-function path. Returns the RAW double;
    round JVM-side with F.round for oracle parity."""

    @F.pandas_udf(T.DoubleType())
    def cos_raw(a: pd.Series, b: pd.Series) -> pd.Series:
        # null vector on either side -> NaN (fails any >= threshold
        # filter), mirroring the null-propagating Catalyst cosine()
        valid = np.fromiter(
            (x is not None and y is not None for x, y in zip(a, b)),
            dtype=bool,
            count=len(a),
        )
        out = np.full(len(a), np.nan)
        if not valid.any():
            return pd.Series(out)
        ma = np.vstack([np.asarray(x, dtype=np.float64) for x in a[valid]])
        mb = np.vstack([np.asarray(x, dtype=np.float64) for x in b[valid]])
        d = ma.shape[1]
        n = int(valid.sum())
        dots = np.zeros(n)
        na = np.zeros(n)
        nb = np.zeros(n)
        for i in range(d):  # exact sequential fold (oracle parity)
            dots = dots + ma[:, i] * mb[:, i]
            na = na + ma[:, i] * ma[:, i]
            nb = nb + mb[:, i] * mb[:, i]
        out[valid] = dots / (np.sqrt(na) * np.sqrt(nb))
        return pd.Series(out)

    return cos_raw


def srp_planes(n_tables: int, n_bits: int, dim: int, seed: int = 20260813) -> "object":
    """Deterministic SRP hyperplane tensor (n_tables·n_bits, dim),
    standard-normal from a fixed-seed PCG64 — identical across runs,
    partitions, and platforms (the invariant the LSH bucket join
    depends on)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((n_tables * n_bits, dim))


def srp_buckets(
    df,
    vec_col: str,
    id_col: str,
    n_bits: int = 8,
    n_tables: int = 8,
    seed: int = 20260813,
    with_vec: bool = False,
):
    """(id, table, bucket) rows: ``n_tables`` independent sign-random-
    projection buckets per vector, packed to an int64. Vectorized
    numpy over Arrow batches — one matmul per batch; rows explode
    ×n_tables but carry only (id, table, bucket), never the vector
    (candidates join back to vectors by id — at 100 TB the vector
    payload must not ride the bucket shuffle).

    ``with_vec=True`` adds the double-cast vector as column ``v`` —
    the payload-carrying variant feeding bucket-local TILE scoring
    (×n_tables data amplification, so only for small/moderate
    n_tables or when bucket-local matmul beats the per-pair
    join-back; see embedding_dup_pairs_lsh for the tradeoff)."""
    id_type = df.schema[id_col].dataType
    fields = [
        T.StructField(id_col, id_type),
        T.StructField("table", T.IntegerType()),
        T.StructField("bucket", T.LongType()),
    ]
    if with_vec:
        fields.append(T.StructField("v", T.ArrayType(T.DoubleType())))
    out_schema = T.StructType(fields)

    def gen(batches):
        pack = 1 << np.arange(n_bits - 1, -1, -1, dtype=np.int64)
        planes = None  # built lazily once dim is known
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # rows with a null vector cannot be bucketed — drop them
            # (the old Catalyst path yielded null and filtered later)
            nonnull = pdf[vec_col].notna()
            if not nonnull.all():
                pdf = pdf[nonnull]
                if len(pdf) == 0:
                    continue
            v = np.vstack([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
            if planes is None:
                planes = srp_planes(n_tables, n_bits, v.shape[1], seed)
            signs = (v @ planes.T) >= 0  # (m, n_tables*n_bits)
            bits = signs.reshape(len(pdf), n_tables, n_bits).astype(np.int64)
            buckets = (bits * pack[None, None, :]).sum(axis=2)  # (m, n_tables)
            ids = pdf[id_col].to_numpy()
            out = {
                id_col: np.repeat(ids, n_tables),
                "table": np.tile(np.arange(n_tables, dtype=np.int32), len(ids)),
                "bucket": buckets.reshape(-1),
            }
            if with_vec:
                out["v"] = [row for row in v for _ in range(n_tables)]
            yield pd.DataFrame(out)

    return df.select(id_col, vec_col).mapInPandas(gen, out_schema)


def hyperplane_bits(vec: Column, n_bits: int = 16, seed: str = "a2b-lsh", table=None) -> Column:
    """Random-hyperplane LSH signature as an n_bits-char sign string.

    Hyperplane components are pseudo-random but fully deterministic:
    component d of plane j is derived from xxhash64(seed, j, d) mapped
    to [-1, 1). Sign of <v, plane_j> gives bit j. Collision probability
    for vectors at angle θ is (1 - θ/π)^n_bits — standard SRP-LSH.
    Computed with higher-order functions over the vector: no shuffle,
    no UDF; at 100 TB this is a map-only stage feeding a bucket join.
    """
    d_idx = F.sequence(F.lit(0), F.size(vec) - 1)
    t = F.lit(0) if table is None else (F.lit(table) if isinstance(table, int) else table)

    def plane_component(j: Column, d: Column) -> Column:
        h = F.xxhash64(F.lit(seed), t, j, d)
        return (F.pmod(h, F.lit(2_000_003)).cast("double") / F.lit(1_000_001.5)) - F.lit(1.0)

    def bit(j: Column) -> Column:
        s = F.aggregate(
            F.zip_with(vec, d_idx, lambda x, d: x * plane_component(j, d)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(s >= 0, F.lit("1")).otherwise(F.lit("0"))

    return F.concat_ws("", F.transform(F.sequence(F.lit(0), F.lit(n_bits - 1)), bit))


def quantize_int8(vec) -> "Column":
    """Symmetric per-vector int8 quantization: scale = max|x| / 127,
    q_i = round(x_i / scale) ∈ [-127, 127]. The standard 4× (vs
    float32) storage/memory cut for embedding corpora — at 100 TB the
    quantized table is what ANN scans keep hot, with the float
    originals cold. Pure codegen (two array HOFs); an all-zero or
    empty vector quantizes to zeros with scale 1.

    Returns a struct(scale double, q array<tinyint>); dequantize with
    :func:`dequantize_int8`. Max reconstruction error is scale/2 per
    finite coordinate. Non-finite coordinates (NaN/Inf) quantize to 0
    and are excluded from the scale — under ANSI mode the bare
    round(NaN).cast('tinyint') would RAISE and one corrupt vector
    would abort the whole job.
    """
    inf = F.lit(float("inf"))
    v = F.transform(
        as_double(vec),
        lambda x: F.when(F.isnan(x) | (F.abs(x) == inf), F.lit(0.0)).otherwise(x),
    )
    mx = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.when((mx.isNotNull()) & (mx > 0), mx / F.lit(127.0)).otherwise(
        F.lit(1.0)
    )
    q = F.transform(v, lambda x: F.round(x / scale).cast("tinyint"))
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize_int8(qstruct: Column) -> Column:
    """Inverse of :func:`quantize_int8`: x̂_i = q_i · scale (double)."""
    s = qstruct["scale"]
    return F.transform(qstruct["q"], lambda x: x.cast("double") * s)


def quantize_embeddings(df, vec_col: str, id_col: str):
    """Staged DataFrame-level int8 quantization: returns
    (id_col, scale double, q array<tinyint>) with identical semantics
    to :func:`quantize_int8`.

    Use THIS for table-scale quantization: the single-expression form
    embeds the scale subexpression inside the per-element lambda, and
    HOF lambdas are interpreted with no common-subexpression
    elimination — O(d²) per row (the same Catalyst pathology as
    winnow_fingerprints' k-gram staging), measured 11× slower at
    sf0.1. Here sanitize → scale → codes are three projections, so
    each is evaluated once per row."""
    inf = F.lit(float("inf"))
    v = F.transform(
        as_double(F.col(vec_col)),
        lambda x: F.when(F.isnan(x) | (F.abs(x) == inf), F.lit(0.0)).otherwise(x),
    )
    s1 = df.select(F.col(id_col), v.alias("__v"))
    mx = F.array_max(F.transform(F.col("__v"), lambda x: F.abs(x)))
    s2 = s1.select(
        F.col(id_col),
        F.col("__v"),
        F.when((mx.isNotNull()) & (mx > 0), mx / F.lit(127.0))
        .otherwise(F.lit(1.0))
        .alias("scale"),
    )
    q = F.transform(F.col("__v"), lambda x: F.round(x / F.col("scale")).cast("tinyint"))
    return s2.select(F.col(id_col), F.col("scale"), q.alias("q"))
