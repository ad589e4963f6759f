"""connect_server_spark — a PySpark-native analytics/ETL engine.

Re-expresses the query and data-processing capabilities of
materials-data-facility/connect_server (an AWS Lambda + DynamoDB + Globus
Flows ETL service) as an idiomatic Spark DataFrame engine, and extends it
with the large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) that a 100 TB corpus needs.

Layout:
    session     SparkSession factory tuned for large-cluster defaults
    tables      loaders for the synthetic star-schema test tables
    plans       filter-expression compiler (scan_table semantics)
    functions   scalar/string/URI/version column expressions
    operators   relational cores: versioning, joins, dedup, similarity, text
    pipeline    submit pipeline + DAG (flow) executor
    sources     readers + per-format extractor registry
    streaming   Structured Streaming surface (status lifecycle, windows)
"""

__version__ = "0.1.0"
