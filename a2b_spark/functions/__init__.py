from a2b_spark.functions import text, vectors

__all__ = ["text", "vectors"]
