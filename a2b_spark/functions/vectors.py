"""Vector math over ``array<float|double>`` columns — Catalyst
higher-order functions only (zip_with / aggregate / transform), no
UDFs: dot products run inside whole-stage codegen.

Determinism: everything is computed in DOUBLE with a sequential
left-fold, matching the explicit formulas used in the DuckDB oracles
(same operand order → bit-identical IEEE results).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


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
    return dot(a, b) / (norm(a) * norm(b))


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
