from flo_spark.operators.consume import consume, head_status, version_vector_filter
from flo_spark.operators.produce import ProduceAck, assign_event_ids

__all__ = [
    "ProduceAck",
    "assign_event_ids",
    "consume",
    "head_status",
    "version_vector_filter",
]
