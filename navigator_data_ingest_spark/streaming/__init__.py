from navigator_data_ingest_spark.streaming.streams import (  # noqa: F401
    src_stream_events,
    stream_dedup_wm,
    stream_enrich_join,
    stream_firstseen,
    stream_foreachbatch_upsert,
    stream_ingest,
    stream_session_append,
    stream_windowed_topk,
    stream_sessionize,
    stream_unique_users_windowed,
)
