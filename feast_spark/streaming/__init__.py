from feast_spark.streaming.processor import (
    StreamProcessor,
    stream_session_agg,
    stream_tumbling_agg,
)

__all__ = ["StreamProcessor", "stream_session_agg", "stream_tumbling_agg"]
