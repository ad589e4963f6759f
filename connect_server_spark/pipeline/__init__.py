"""Pipeline compositions: multi-stage transformations assembled from the
operator library (submit pipeline, flow DAG)."""
