"""Process-level plan-cache plumbing shared by the operator modules.

Several operator families keep a bounded LRU of persisted intermediates
(similarity pair sets, connected-component maps, the co-supply edge list)
so that a suite of queries consuming the SAME expensive artifact within one
process reuses it instead of recomputing. Two cross-cutting concerns live
here so each module does not reinvent them:

- :func:`session_token` — a collision-free per-``SparkSession`` cache-key
  component. ``id(session)`` can be REUSED after a session object is
  garbage-collected (CPython recycles addresses), which would let a stale
  cache entry leak into a new session; a uuid attached to the session
  object on first use cannot collide.
- :func:`register_cache_clearer` / :func:`clear_plan_caches` — a registry
  of "drop everything" callbacks, one per module LRU, so cold-path
  measurement code (bench.py's regression re-time) can empty every
  process-level cache AND Spark's own CacheManager in one call. Without
  this, re-timing a flagged query measures an InMemoryTableScan of the
  first run's persisted intermediates, not the plan.
"""

from __future__ import annotations

import uuid
from collections.abc import Callable

from pyspark.sql import SparkSession

_TOKEN_ATTR = "_spark_graft_cache_token"

_CLEARERS: list[Callable[[], None]] = []


def session_token(spark: SparkSession) -> str:
    """Stable, non-reusable identity for ``spark`` (see module docstring)."""
    tok = getattr(spark, _TOKEN_ATTR, None)
    if tok is None:
        tok = uuid.uuid4().hex
        setattr(spark, _TOKEN_ATTR, tok)
    return tok


def register_cache_clearer(fn: Callable[[], None]) -> Callable[[], None]:
    """Register a module's drop-my-LRU callback; returns ``fn`` so it can
    be used as a decorator."""
    _CLEARERS.append(fn)
    return fn


def clear_plan_caches(spark: SparkSession | None = None) -> None:
    """Empty every registered module LRU (unpersisting their DataFrames)
    and, when a session is given, Spark's CacheManager too — so the next
    execution of any registered plan is a genuine cold run."""
    for fn in _CLEARERS:
        fn()
    if spark is not None:
        spark.catalog.clearCache()


#: Generic bounded registry for one-off persisted plan intermediates
#: (specs that scan an expensive derived frame more than once persist it
#: through here). Oldest entries unpersist on overflow — correctness is
#: unaffected, lineage recomputes — and clear_plan_caches drops them all
#: for cold-path measurement.
_TRACKED: list = []
_TRACKED_MAX = 32


def track_persist(df):
    """Record a persisted DataFrame in the shared bounded registry and
    return it (chainable around ``.persist(...)``)."""
    _TRACKED.append(df)
    while len(_TRACKED) > _TRACKED_MAX:
        old = _TRACKED.pop(0)
        try:
            old.unpersist()
        except Exception:
            pass
    return df


@register_cache_clearer
def _clear_tracked() -> None:
    while _TRACKED:
        old = _TRACKED.pop()
        try:
            old.unpersist()
        except Exception:
            pass
