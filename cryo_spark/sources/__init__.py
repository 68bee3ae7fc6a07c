from cryo_spark.sources.replay import raw

__all__ = ["raw"]
