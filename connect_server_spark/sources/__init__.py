"""Source readers: schema-enforced, corrupt-tolerant loaders per format."""

from connect_server_spark.sources.readers import (
    read_binary_dir,
    read_csv_table,
    read_json_submissions,
)

__all__ = [
    "read_json_submissions",
    "read_csv_table",
    "read_binary_dir",
]
