"""Relational operators: versioned-read, org-join, dedup, similarity, text.

Each module is pure DataFrame composition (no Python UDFs unless a module
explicitly documents why); driver-facing queries live in
``connect_server_spark.queries`` and import from here.
"""
