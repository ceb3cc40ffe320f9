"""Byte-blob persistence for small driver-side index state
(BloomFilter bitmaps, PQ codebooks) — the sidecar convention next to
``minhash_index``'s parquet state for standing pipelines.

Beyond-reference layer (no exon counterpart).

These objects are megabytes, not datasets, so they persist as single
files via the JVM Hadoop ``FileSystem`` API when a SparkSession is up —
the same path space the cluster already writes (``file:``, ``hdfs:``,
``s3a:``), no extra client libraries, atomic-enough single-stream
writes. Without a session (offline tooling), plain local file IO.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _session(spark: SparkSession | None) -> SparkSession | None:
    return spark or SparkSession.getActiveSession()


def write_state_bytes(
    path: str, data: bytes, spark: SparkSession | None = None
) -> None:
    """Write ``data`` to ``path`` (overwrites). Hadoop FS when a Spark
    session exists — any scheme the cluster can write — else local."""
    spark = _session(spark)
    if spark is None:
        with open(path, "wb") as fh:
            fh.write(data)
        return
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(data))
    finally:
        out.close()


def read_state_bytes(path: str, spark: SparkSession | None = None) -> bytes:
    """Read all of ``path``; the mirror of ``write_state_bytes``."""
    spark = _session(spark)
    if spark is None:
        with open(path, "rb") as fh:
            return fh.read()
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(hpath)
    try:
        # IOUtils ships with Hadoop on every Spark classpath
        data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    return bytes(data)
