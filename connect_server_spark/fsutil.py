"""Hadoop FileSystem helpers for small control-plane files and renames.

The data plane always moves through Spark readers/writers, but sinks and
streaming maintenance also need a few control-plane filesystem operations:
atomic manifest writes, rename swaps, existence probes. Python's ``os`` /
``open`` only work when the store is a local path — at 100 TB the store is
HDFS/S3, where those calls silently operate on the driver's local disk
instead. Everything here goes through the JVM Hadoop ``FileSystem`` API
(the same route ``storage.compact`` uses), so the code is correct for any
Hadoop-supported scheme while behaving identically on ``file:``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

__all__ = [
    "fs_exists",
    "fs_rename",
    "fs_delete",
    "write_text_atomic",
    "read_text",
]


def _fs_and_path(spark: SparkSession, path: str):
    hadoop_path = spark._jvm.org.apache.hadoop.fs.Path
    jpath = hadoop_path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath, hadoop_path


def fs_exists(spark: SparkSession, path: str) -> bool:
    fs, jpath, _ = _fs_and_path(spark, path)
    return bool(fs.exists(jpath))


def fs_rename(spark: SparkSession, src: str, dst: str) -> None:
    """Rename ``src`` to ``dst``; raises if the filesystem refuses (e.g.
    destination exists). On HDFS this is atomic; on S3A it is a copy —
    callers that rely on rename atomicity for commit markers should
    write-tmp-then-rename WITHIN one directory, which every Hadoop FS
    implements as the standard job-commit primitive."""
    fs, jsrc, hadoop_path = _fs_and_path(spark, src)
    if not fs.rename(jsrc, hadoop_path(dst)):
        raise OSError(f"rename failed: {src} -> {dst}")


def fs_delete(spark: SparkSession, path: str, recursive: bool = True) -> bool:
    fs, jpath, _ = _fs_and_path(spark, path)
    return bool(fs.delete(jpath, recursive))


def write_text_atomic(spark: SparkSession, path: str, text: str) -> None:
    """Write a small text file so readers never observe a partial write:
    create a dot-prefixed sibling, stream + hflush + close, then rename
    over the final name (deleting a stale final first — Hadoop rename
    does not overwrite). Used for commit-marker manifests, so the
    ordering guarantee is: the final name exists ⇒ the content is whole."""
    fs, jpath, hadoop_path = _fs_and_path(spark, path)
    parent = jpath.getParent()
    tmp = hadoop_path(parent, "." + jpath.getName() + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
        out.hflush()
    finally:
        out.close()
    if fs.exists(jpath):
        fs.delete(jpath, False)
    if not fs.rename(tmp, jpath):
        raise OSError(f"rename failed: {tmp} -> {path}")


def read_text(spark: SparkSession, path: str) -> str:
    fs, jpath, _ = _fs_and_path(spark, path)
    stream = fs.open(jpath)
    try:
        # IOUtils.toByteArray handles short reads; the manifest is small.
        data = spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    return bytes(data).decode("utf-8")
