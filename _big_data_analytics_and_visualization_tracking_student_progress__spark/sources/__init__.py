from .readers import (
    events_file_stream,
    events_stream_schema,
    file_stream,
    kafka_json_sink,
    kafka_json_source,
    parse_kafka_json,
    read_csv,
    read_excel,
    read_json,
    read_parquet,
)

__all__ = [
    "events_file_stream",
    "events_stream_schema",
    "file_stream",
    "kafka_json_sink",
    "kafka_json_source",
    "parse_kafka_json",
    "read_csv",
    "read_excel",
    "read_json",
    "read_parquet",
]
