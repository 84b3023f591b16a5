from a2b_spark.operators import dedup, similarity

__all__ = ["dedup", "similarity"]
