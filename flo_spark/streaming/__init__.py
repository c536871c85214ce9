from flo_spark.streaming.consume_stream import consume_stream, run_to_memory

__all__ = ["consume_stream", "run_to_memory"]
