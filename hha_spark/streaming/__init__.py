from hha_spark.streaming.spike_stream import (
    evict_expired_hours,
    make_batch_processor,
    run_streaming_detector,
)

__all__ = ["evict_expired_hours", "make_batch_processor", "run_streaming_detector"]
