from connect_server_spark.plans.filter_compiler import (
    FilterCompileError,
    compile_filters,
    scan_table,
    try_scan_table,
    user_scoped_filters,
)

__all__ = [
    "FilterCompileError",
    "compile_filters",
    "scan_table",
    "try_scan_table",
    "user_scoped_filters",
]
