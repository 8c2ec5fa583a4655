"""Hadoop FileSystem helpers for streaming state management.

The streaming dedup/ANN surfaces manage their own partition directories
— list committed ``batch=N`` dirs, fold them into ``compact=M`` dirs,
delete superseded ones. Round 4 did that with ``pathlib.Path.glob`` +
``shutil.rmtree``, which only works where the store is a local POSIX
path; at deployment scale the store lives where the data lives
(HDFS/S3/ABFS). These helpers reach Hadoop's FileSystem API through the
session's JVM gateway (``spark._jvm``), so ONE code path drives
``/local/path``, ``file://``, ``hdfs://``, ``s3a://``, … — the
FileSystem implementation is resolved from the path's scheme by Hadoop
itself.

Directory strings handed back to callers are always built by joining
the caller's own root string with the child name, never from Hadoop's
(re-qualified) URIs — so whatever scheme/authority the caller used is
preserved verbatim in every read/write/compare downstream.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

__all__ = [
    "fs_delete",
    "fs_exists",
    "fs_read_text",
    "fs_write_text",
    "partition_ids",
]


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def partition_ids(
    spark: SparkSession, root: str, prefix: str, *, committed: bool = True
) -> "list[int]":
    """Numeric ids N of the ``{root}/{prefix}=N`` child directories.

    ``committed=True`` (the read side) lists only directories holding a
    ``_SUCCESS`` marker — a dir a crashed write left half-filled is
    invisible to readers. ``committed=False`` (the compaction delete
    side) lists every matching dir, so stale uncommitted leftovers are
    cleaned up too."""
    pattern = f"{root}/{prefix}=*/_SUCCESS" if committed else f"{root}/{prefix}=*"
    fs, jp = _fs_and_path(spark, pattern)
    statuses = fs.globStatus(jp)
    if statuses is None:  # parent does not exist (no output yet)
        return []
    ids = []
    for st in statuses:
        p = st.getPath()
        name = (p.getParent() if committed else p).getName()
        ids.append(int(name.split("=", 1)[1]))
    return sorted(ids)


def fs_exists(spark: SparkSession, path: str) -> bool:
    fs, jp = _fs_and_path(spark, path)
    return bool(fs.exists(jp))


def fs_read_text(spark: SparkSession, path: str) -> "str | None":
    """UTF-8 contents of a small marker/metadata file, or None when the
    path does not exist. Driver-side, for KB-scale state stamps only."""
    fs, jp = _fs_and_path(spark, path)
    if not fs.exists(jp):
        return None
    stream = fs.open(jp)
    try:
        jvm = spark._jvm
        out = jvm.java.io.ByteArrayOutputStream()
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, out, 65536, False)
        return bytes(out.toByteArray()).decode("utf-8")
    finally:
        stream.close()


def fs_write_text(spark: SparkSession, path: str, text: str) -> None:
    """Write (overwrite) a small UTF-8 marker/metadata file."""
    fs, jp = _fs_and_path(spark, path)
    stream = fs.create(jp, True)
    try:
        stream.write(bytearray(text.encode("utf-8")))
    finally:
        stream.close()


def fs_delete(spark: SparkSession, path: str) -> None:
    """Recursive delete; absent paths are a no-op (matching the
    ``shutil.rmtree(..., ignore_errors=True)`` this replaces)."""
    fs, jp = _fs_and_path(spark, path)
    fs.delete(jp, True)
