"""Keyed JSONL (line-delimited JSON) destination — the interchange
format of LLM training-data pipelines (one JSON document per line;
Spark's native ``json`` format IS JSONL).

Same versioned-table machinery as the CSV sink (atomic version-flip
commits, snapshot-isolated reads, keyed merge/delete); schema persists
in ``_SCHEMA`` so typed columns survive the text round trip without
inference drift. Reference parity: the flush-atomicity contract of
CsvDestinationDriver (src/Drivers/Destination/
CsvDestinationDriver.php:198-203) applied to the format a training
pipeline actually exports.
"""

from __future__ import annotations

from typing import Sequence

from a2b_spark.sinks.base import VersionedTableDestination


class JsonlDestination(VersionedTableDestination):
    fmt = "json"

    def __init__(self, path: str, key_cols: Sequence[str]):
        super().__init__(path, key_cols)
