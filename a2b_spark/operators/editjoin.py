"""Edit-distance similarity join (fuzzy key matching) with exact
pigeonhole blocking — the PassJoin family (Li et al., PVLDB 2011)
reduced to its k=1 core.

The curation use case: entity keys that should be identical but
diverge by one typo (crawl ids, file names, near-identical titles).
An all-pairs levenshtein is the O(n²) anti-pattern; the exact
blocking observation for distance ≤ 1 between EQUAL-LENGTH strings:
one edit touches one position, so splitting each string into two
halves, at least one half is untouched — every qualifying pair
collides on (half index, half text, length). The candidate join is
equi on that key (bounded buckets: names sharing a half), then the
survivors verify with the built-in ``levenshtein`` (JVM codegen).

Equal length is part of the SEMANTICS here (distance ≤ 1 with a
length change is a pure insert/delete; callers wanting that case can
union a second pass keyed on the deleted-position variants — the
general-k PassJoin partition scheme — noted as future work).

Reference parity: the reference's per-row key lookup
(src/DataMigration/DataMigrationMapper.php) is exact-match only; this
operator is the fuzzy extension a large dirty corpus needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edit_distance_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """(id_a, id_b, dist): unordered pairs of equal-length values with
    levenshtein distance ≤ ``max_dist`` (currently 1 — the halves
    pigeonhole; k>1 needs the general segment scheme). Null values
    never match."""
    if max_dist != 1:
        raise NotImplementedError(
            "edit_distance_pairs implements the k=1 halves pigeonhole; "
            "general k needs the full PassJoin segment scheme"
        )
    base = df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t")).filter(
        F.col("__t").isNotNull()
    )
    ln = F.length("__t")
    left = F.expr("substring(__t, 1, cast(length(__t)/2 as int))")
    right = F.expr("substring(__t, cast(length(__t)/2 as int) + 1, length(__t))")
    # two posting keys per value: (segment index, segment text, length)
    keys = base.select(
        "__id",
        "__t",
        ln.alias("__len"),
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("seg"), left.alias("part")),
                F.struct(F.lit(1).alias("seg"), right.alias("part")),
            )
        ).alias("__k"),
    ).select(
        "__id", "__t", "__len",
        F.col("__k.seg").alias("__seg"), F.col("__k.part").alias("__part"),
    )
    a = keys.select(
        F.col("__id").alias("id_a"), F.col("__t").alias("__ta"),
        "__len", "__seg", "__part",
    )
    b = keys.select(
        F.col("__id").alias("id_b"), F.col("__t").alias("__tb"),
        "__len", "__seg", "__part",
    )
    cands = (
        a.join(b, ["__len", "__seg", "__part"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__ta", "__tb")
        .distinct()
    )
    return (
        cands.withColumn("dist", F.levenshtein("__ta", "__tb").cast("int"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
    )
