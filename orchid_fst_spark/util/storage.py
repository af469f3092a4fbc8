"""Session-lifetime hygiene for operator-internal persists.

The dedup/similarity operators persist intermediates they scan more
than once (band rows, signature frames, the mapped id frame of the
end-to-end dedups).  Spark's CacheManager keeps those entries alive for
the whole session even after the caller has dropped every reference —
``persist`` registers the *plan* JVM-side, so Python garbage collection
never releases it.  A long-lived session (service, notebook) calling
the operators repeatedly would accumulate entries until session death.

Every operator-internal persist therefore goes through
:func:`maybe_persist`, which records the frame here; call
:func:`release_persisted` between pipelines to unpersist everything the
library persisted (user-side caches are untouched — this is NOT
``spark.catalog.clearCache``).  Strong references are intentional: the
JVM entry outlives the Python wrapper, so a weakref that died would be
an unreleasable leak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_PERSISTED: list[DataFrame] = []


def maybe_persist(df: DataFrame, storage: str | None) -> DataFrame:
    """Persist ``df`` under the named StorageLevel and register it for
    :func:`release_persisted`; ``storage=None`` is a no-op (the plan is
    recomputed per scan — the right call for one-shot pipelines that
    never want CacheManager entries at all)."""
    if storage is None:
        return df
    df = df.persist(getattr(StorageLevel, storage))
    _PERSISTED.append(df)
    return df


def release_persisted() -> int:
    """Unpersist every intermediate the library persisted since the
    last call (blocking=False: eviction proceeds in the background).
    Returns the number of frames released."""
    n = 0
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped
            pass
    return n
