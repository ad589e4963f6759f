from connect_server_spark.functions.source_ids import (
    DELETE_WORDS,
    increment_record_version,
    make_source_name,
    split_source_id,
    version_sort_key,
)
from connect_server_spark.functions.uris import (
    lookup_http_host,
    make_globus_app_link,
    normalize_globus_uri,
)
from connect_server_spark.functions.metadata import (
    STATUS_CODE_LETTERS,
    creators_join,
    default_resource_type,
    ingest_date,
    status_code_letter,
    status_message,
    tags_to_subjects,
)

__all__ = [
    "DELETE_WORDS",
    "STATUS_CODE_LETTERS",
    "creators_join",
    "default_resource_type",
    "increment_record_version",
    "ingest_date",
    "lookup_http_host",
    "make_globus_app_link",
    "make_source_name",
    "normalize_globus_uri",
    "split_source_id",
    "status_code_letter",
    "status_message",
    "tags_to_subjects",
    "version_sort_key",
]
