from a2b_spark.core.migration import IdField, Migration, MigrationRegistry
from a2b_spark.core.ids import cast_ids, deterministic_dest_id

__all__ = ["IdField", "Migration", "MigrationRegistry", "cast_ids", "deterministic_dest_id"]
