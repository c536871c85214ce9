from flo_spark.sources.event_table import EventStream

__all__ = ["EventStream"]
