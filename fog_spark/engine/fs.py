"""Filesystem operations through the Hadoop FileSystem API.

The checkpoint and streaming layers previously used Python ``os`` /
``shutil`` calls, which only work when the driver shares a local POSIX
filesystem with the data — false on any real cluster. Every path
operation here goes through ``org.apache.hadoop.fs.FileSystem`` (via
the JVM gateway), so ``file:/``, ``hdfs://``, ``s3a://`` etc. all work
with the same code; rename is the FS's atomic rename where the FS
provides one (local FS and HDFS do).

These are driver-side control-plane calls (a handful per superstep /
micro-batch) — the data plane stays in Spark jobs.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import SparkSession


def _fs_path(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, jpath


def exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs_path(spark, path)
    return bool(fs.exists(p))


def mkdirs(spark: SparkSession, path: str) -> None:
    fs, p = _fs_path(spark, path)
    fs.mkdirs(p)


def delete(spark: SparkSession, path: str, recursive: bool = True) -> bool:
    fs, p = _fs_path(spark, path)
    return bool(fs.delete(p, recursive))


def rename(spark: SparkSession, src: str, dst: str) -> bool:
    """FS rename (atomic on local FS / HDFS). Returns False on failure
    (e.g. destination exists on some filesystems) — callers that
    overwrite must delete the destination first."""
    fs, s = _fs_path(spark, src)
    _, d = _fs_path(spark, dst)
    return bool(fs.rename(s, d))


def scratch_dir(spark: SparkSession, prefix: str = "scratch") -> str:
    """Unique scratch directory under the configured scratch root —
    the cluster-faithful replacement for driver-local tempfile.mkdtemp
    (which silently assumes the driver shares a POSIX FS with the data).

    Root resolution: spark conf ``spark.fogspark.scratchRoot``, then env
    ``FOG_SPARK_SCRATCH``, else ``file:/<system tempdir>``. Any URI the
    Hadoop FS layer resolves works (file:/, hdfs://, s3a://...).
    """
    root = (
        spark.conf.get("spark.fogspark.scratchRoot", None)
        or os.environ.get("FOG_SPARK_SCRATCH")
        or "file:" + tempfile.gettempdir()
    )
    path = f"{root.rstrip('/')}/{prefix}-{uuid.uuid4().hex[:12]}"
    mkdirs(spark, path)
    return path


def list_names(spark: SparkSession, path: str) -> list[str]:
    """Child names (not full paths) of a directory; [] if absent."""
    fs, p = _fs_path(spark, path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def write_text(spark: SparkSession, path: str, text: str) -> None:
    """Create/overwrite a small text file (control-plane metadata)."""
    fs, p = _fs_path(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_text(spark: SparkSession, path: str) -> str:
    fs, p = _fs_path(spark, path)
    stream = fs.open(p)
    try:
        jvm = spark.sparkContext._jvm
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
