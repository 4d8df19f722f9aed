from navigator_data_ingest_spark.streaming.streams import (  # noqa: F401
    src_stream_events,
    stream_ingest,
    stream_enrich_join,
    stream_firstseen,
    stream_sessionize,
)
