from flink_infotheoretic_feature_selection_spark.streaming.ops import (
    read_documents_jsonl_stream,
    read_events_stream,
    stream_decontaminate,
    stream_neardup_candidates,
    stream_range_join,
    sessionize_stream,
    stateful_user_stats,
    stream_feature_histogram,
    stream_text_stats,
    stream_tokenize_bpe,
    streaming_dedup,
    windowed_event_agg,
)

__all__ = [
    "read_documents_jsonl_stream",
    "read_events_stream",
    "stream_decontaminate",
    "stream_neardup_candidates",
    "stream_range_join",
    "sessionize_stream",
    "stateful_user_stats",
    "stream_feature_histogram",
    "stream_text_stats",
    "stream_tokenize_bpe",
    "streaming_dedup",
    "windowed_event_agg",
]
