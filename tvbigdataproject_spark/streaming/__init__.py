from tvbigdataproject_spark.streaming.events import (  # noqa: F401
    read_event_stream,
    run_to_memory_sink,
    streaming_dedup,
    streaming_ohlc_agg,
    streaming_session_agg,
    streaming_tumbling_agg,
    streaming_value_bins,
)
