"""Compatibility re-export; the merge expression layer lives in
:mod:`a2b_spark.storage.merge` (next to the table format that uses it,
avoiding a package-init cycle)."""

from a2b_spark.storage.merge import merge_dataframes

__all__ = ["merge_dataframes"]
