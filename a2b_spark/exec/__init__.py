from a2b_spark.exec.merge import merge_dataframes
from a2b_spark.exec.executor import run_migration, MigrationResult

__all__ = ["merge_dataframes", "run_migration", "MigrationResult"]
