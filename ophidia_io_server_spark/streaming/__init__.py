from ophidia_io_server_spark.streaming.ingest import (  # noqa: F401
    events_stream,
    hourly_counts_stream,
    run_available_now,
    stateful_dedup_stream,
    streaming_insert_fragment,
)
