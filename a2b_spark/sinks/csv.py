"""Keyed, readable CSV destination.

Reference: CsvDestinationDriver (src/Drivers/Destination/
CsvDestinationDriver.php:61-203) — buffers rows to a temp file, then
atomically copies over the destination on flush (:198-203); readable
back via read/readMultiple predicates (:156-175); getExistingIds
projects the id columns (:177-190).

Spark design: same versioned-table machinery as the Parquet sink with
``fmt="csv"`` — every commit IS the reference's atomic tempfile+copy
(whole new version dir, `_CURRENT` flip), and readback is a DataFrame
scan instead of per-row predicate evaluation. The schema persists in
``_SCHEMA`` so typed ids survive the CSV round trip (the reference
re-casts via IdTypeConversionTrait; we re-apply the written schema).
"""

from __future__ import annotations

from typing import Sequence

from a2b_spark.sinks.base import VersionedTableDestination


class CsvDestination(VersionedTableDestination):
    fmt = "csv"

    def __init__(self, path: str, key_cols: Sequence[str]):
        super().__init__(path, key_cols)
