"""Explicit lifecycle management for persisted intermediate frames.

Operators that cache an intermediate (MinHash signature stores, IVF
assignments, token-hash projections) need a way to hand the cache's
lifetime to the caller.  Attribute-stashing the handle on the returned
DataFrame (``out.sig_store = ...``) is fragile — the attribute is lost on
any further transformation — so the engine uses an explicit ``CacheBag``:

- operators accept an optional ``caches: CacheBag`` and register every
  frame they persist in it;
- the caller releases the bag when it has materialized what it needs
  (``bag.release()``, or use the bag as a context manager);
- with no bag supplied the operator still persists (the cache is what
  makes the plan single-scan) but registers the entry in the
  module-level ``SESSION_BAG``, so every harness's between-query
  ``release_session_caches()`` reclaims it — a raw session persist
  would pin the plan (and its disk blocks) until session end with no
  release path.  The CacheManager's canonical-plan dedup (a re-run of
  the same query re-uses the existing entry instead of adding one)
  bounds the footprint between releases.

Registry queries — which must return a LAZY frame through a fixed
``(spark, sf_dir)`` signature, so they cannot unpersist after their own
materialization — register caches in the module-level ``SESSION_BAG``;
harnesses that materialize each query (bench.py does) call
``release_session_caches()`` between queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


class CacheBag:
    """A set of persisted DataFrames released together.

    ``add`` persists the frame (MEMORY_AND_DISK — spill, don't recompute)
    and tracks it; ``release`` unpersists everything tracked.  Safe to
    release frames that were never materialized, and safe to call twice.
    """

    def __init__(self) -> None:
        self._frames: list[DataFrame] = []

    def add(
        self,
        df: DataFrame,
        level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
    ) -> DataFrame:
        out = df.persist(level)
        self._frames.append(out)
        return out

    def release(self) -> None:
        frames, self._frames = self._frames, []
        for df in frames:
            df.unpersist()

    def __len__(self) -> int:
        return len(self._frames)

    def __enter__(self) -> "CacheBag":
        return self

    def __exit__(self, *exc) -> None:
        self.release()


#: caches created inside registry queries (lazy return — the query
#: function cannot release them itself); harnesses release between runs
SESSION_BAG = CacheBag()


def release_session_caches() -> None:
    """Unpersist every cache a registry query registered this session."""
    SESSION_BAG.release()
