from a2b_spark.mapping.store import MappingStore, STATUS_MIGRATED, STATUS_STUB

__all__ = ["MappingStore", "STATUS_MIGRATED", "STATUS_STUB"]
