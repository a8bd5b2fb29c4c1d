from chronominer_spark.streaming.validate import (  # noqa: F401
    incremental_validation_query,
    windowed_event_counts_stream,
)
