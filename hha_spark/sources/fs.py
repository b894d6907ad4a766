"""Filesystem operations through the JVM Hadoop FileSystem API.

The reference probes and lists its hourly input files via the Hadoop
FileSystem (hha.py:271-274,299), which works identically against
local disk, HDFS, and object stores with a Hadoop connector. The
driver-side ``os.path`` calls this module replaces were correct only
on a single machine's local disk.

Every helper takes the active SparkSession and resolves the
FileSystem FROM THE PATH (``Path.getFileSystem``), so ``hdfs://``,
``s3a://``, and bare local paths all route correctly; no extra Python
dependencies are involved. If the JVM gateway is unavailable (no
session — e.g. pure-driver unit code), a local-FS fallback keeps
behavior identical on local paths.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def exists(spark: SparkSession | None, path: str) -> bool:
    if spark is None:
        return os.path.exists(path)
    fs, p = _fs_and_path(spark, path)
    return bool(fs.exists(p))


def listdir(spark: SparkSession | None, path: str) -> list[str]:
    """Child names (not full paths) of a directory; [] if missing."""
    if spark is None:
        return os.listdir(path) if os.path.isdir(path) else []
    fs, p = _fs_and_path(spark, path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def rename(spark: SparkSession | None, src: str, dst: str) -> bool:
    """Hadoop-semantics rename: atomic on HDFS/local, no implicit
    overwrite of a non-empty destination directory."""
    if spark is None:
        os.rename(src, dst)
        return True
    fs, s = _fs_and_path(spark, src)
    _, d = _fs_and_path(spark, dst)
    return bool(fs.rename(s, d))


def write_text(spark: SparkSession | None, path: str, content: str) -> None:
    """Create (overwrite) a small text file — marker/metadata files
    for multi-step directory protocols (see streaming/store.py)."""
    if spark is None:
        with open(path, "w") as f:
            f.write(content)
        return
    fs, p = _fs_and_path(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def write_bytes(spark: SparkSession | None, path: str, data: bytes) -> None:
    """Create (overwrite) a small binary file from driver memory —
    e.g. a driver-serialized parquet buffer that executors then read
    back as a normal scan (streaming/curation_stream.py label spill).
    One py4j call carries the whole payload; parent dirs are created
    by Hadoop's create(). Bounded by the caller's envelope (the spill
    sites cap at the union-find envelope, ~10 MB)."""
    if spark is None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(data)
        return
    fs, p = _fs_and_path(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(data))
    finally:
        out.close()


def read_text(spark: SparkSession | None, path: str) -> str:
    """Read a small text file written by write_text."""
    if spark is None:
        with open(path) as f:
            return f.read()
    fs, p = _fs_and_path(spark, path)
    stream = fs.open(p)
    try:
        # one py4j round trip for the whole payload (byte-at-a-time
        # stream.read() would cost one JVM call per byte)
        data = spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        return bytes(data).decode("utf-8")
    finally:
        stream.close()


def delete(spark: SparkSession | None, path: str, *, recursive: bool = True) -> bool:
    """Delete a file or directory tree; False when already absent."""
    if spark is None:
        if not os.path.exists(path):
            return False
        if os.path.isdir(path):
            shutil.rmtree(path)
        else:
            os.remove(path)
        return True
    fs, p = _fs_and_path(spark, path)
    if not fs.exists(p):
        return False
    return bool(fs.delete(p, recursive))
