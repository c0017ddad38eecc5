from feast_spark.streaming.stateful import stateful_sessionize
from feast_spark.streaming.processor import (
    StreamProcessor,
    stream_session_agg,
    stream_tumbling_agg,
)

__all__ = ["StreamProcessor", "stateful_sessionize", "stream_session_agg", "stream_tumbling_agg"]
