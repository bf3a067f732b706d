"""Hadoop-filesystem access + crash-safe directory swaps for store
maintenance jobs (compactions).

Everything goes through the session's Hadoop configuration so the same
code works on any scheme the session can reach — local, s3a, hdfs —
rather than driver-local ``os`` calls that only see local disk.

The swap protocol (``recover_pending_swap`` + ``swap_dir``) exists
because a compaction that rewrites a store wants delete + rename, and
a crash between the two leaves the side copy as the ONLY copy.  Worse,
a concurrent writer that "helpfully" recreates the final directory in
that window would make a naive "final missing?" recovery check skip the
restore and a subsequent compaction would overwrite the side copy —
destroying the store.  A persistent ``<final>_swap_pending`` marker
closes both holes: writers refuse while it exists
(``assert_no_pending_swap``), and recovery branches on the marker, not
on directory existence.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` under the session's Hadoop conf."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def checked_rename(fs, src, dst) -> None:
    """Hadoop rename reports failure by RETURNING FALSE — unchecked, a
    failed swap would surface later as a confusing missing-path error
    (or not at all)."""
    if not fs.rename(src, dst):
        raise IOError(f"filesystem rename failed: {src} -> {dst}")


def _marker(final_dir: str) -> str:
    return final_dir.rstrip("/") + "_swap_pending"


def assert_no_pending_swap(spark: SparkSession, final_dir: str) -> None:
    """Writers call this before touching ``final_dir``: recreating the
    directory while a crashed swap is pending would disable the
    recovery branch and let the next compaction destroy the only
    complete copy."""
    fs, mark_p = hadoop_fs(spark, _marker(final_dir))
    if fs.exists(mark_p):
        raise RuntimeError(
            f"a compaction of {final_dir} crashed mid-swap (marker "
            f"{_marker(final_dir)} exists); run the compaction again to "
            f"recover before writing"
        )


def recover_pending_swap(
    spark: SparkSession, tmp_dir: str, final_dir: str
) -> bool:
    """Repair a crashed swap.  Returns True if the side copy was swapped
    in (the previous compaction's result is now live — the caller
    should NOT re-compact on top of it without re-reading).  Returns
    False when there is nothing pending (or the crash happened before
    the destructive step, in which case the side copy is discarded and
    a fresh compaction is safe)."""
    fs, final_p = hadoop_fs(spark, final_dir)
    _, tmp_p = hadoop_fs(spark, tmp_dir)
    _, mark_p = hadoop_fs(spark, _marker(final_dir))
    if not fs.exists(mark_p):
        if not fs.exists(final_p) and fs.exists(tmp_p):
            raise IOError(
                f"{final_dir} is missing but {tmp_dir} exists with no "
                f"swap marker — refusing to guess; restore manually"
            )
        return False
    if fs.exists(final_p):
        # crash BEFORE the delete (final still complete) or AFTER the
        # rename (swap done, marker cleanup lost): final is
        # authoritative either way — discard any side copy
        if fs.exists(tmp_p):
            fs.delete(tmp_p, True)
        fs.delete(mark_p, False)
        return False
    if not fs.exists(tmp_p):
        raise IOError(
            f"crashed swap of {final_dir}: both the directory and the "
            f"side copy {tmp_dir} are missing — unrecoverable here"
        )
    checked_rename(fs, tmp_p, final_p)
    fs.delete(mark_p, False)
    return True


def swap_dir(spark: SparkSession, tmp_dir: str, final_dir: str) -> None:
    """Swap a fully-written side directory into place: marker → delete
    final → rename → clear marker.  At every instant a complete copy
    exists on storage; a crash in the destructive window is repaired by
    ``recover_pending_swap``."""
    fs, final_p = hadoop_fs(spark, final_dir)
    _, tmp_p = hadoop_fs(spark, tmp_dir)
    _, mark_p = hadoop_fs(spark, _marker(final_dir))
    fs.create(mark_p, True).close()
    fs.delete(final_p, True)
    checked_rename(fs, tmp_p, final_p)
    fs.delete(mark_p, False)
