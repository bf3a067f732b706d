"""Hadoop-filesystem access for store-maintenance jobs (compactions,
swaps).  Goes through the session's Hadoop configuration so the same
code works on any scheme the session can reach — local, s3a, hdfs —
rather than driver-local ``os`` calls that only see local disk.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` under the session's Hadoop conf."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath
