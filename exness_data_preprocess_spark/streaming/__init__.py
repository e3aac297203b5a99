from exness_data_preprocess_spark.streaming.ohlc_stream import (
    run_available_now_to_memory,
    stream_dedup_ticks,
    stream_ohlc_1m,
    stream_stream_time_join,
    tick_file_stream,
    write_stream_ohlc,
)
from exness_data_preprocess_spark.streaming.anomaly import stateful_running_anomaly
from exness_data_preprocess_spark.streaming.stateful import stateful_gap_sessions

__all__ = [
    "tick_file_stream",
    "stream_dedup_ticks",
    "stream_ohlc_1m",
    "stream_stream_time_join",
    "run_available_now_to_memory",
    "write_stream_ohlc",
    "stateful_gap_sessions",
    "stateful_running_anomaly",
]
