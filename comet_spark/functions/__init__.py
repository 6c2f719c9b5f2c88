from comet_spark.functions import text, vector

__all__ = ["vector", "text"]
