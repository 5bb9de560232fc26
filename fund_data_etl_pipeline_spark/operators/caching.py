"""GC-tied reclamation for deliberately long-lived ``.persist()`` calls.

Several builders persist a prepped intermediate that the RETURNED lazy
plan scans two or more times (norm-prepped embeddings, signature
tables — the tools/audit_plans.py PERSIST_OK set). Unpersisting before
return would silently recompute the HOF prep once per scan (the
contamination_check 1 s -> 81 s pathology, bench.py docstring), so the
cache must outlive the builder call — but a cache that outlives the
RESULT is a leak reclaimed only by a caller-side ``clearCache()``.
This module ties the two lifetimes together: the cached table is
unpersisted when the returned plan handle is garbage-collected
(round-5 VERDICT "What's wrong" #2, the weakref-style unpersist hook).

Apply ONLY to the outermost handle the caller receives. A finalizer on
an intermediate that the builder itself derives from and then drops
would fire before materialization and reintroduce the recompute
pathology. Operator-internal persists (operators/dedup.py signature /
shingle / occurrence tables, whose results every builder derives
further) therefore cannot self-tie — instead they enroll via
``persist_tracked`` into the ambient collector that the query
registry's wrapper (plans/__init__.register) opens around the OUTERMOST
builder call, and the wrapper ties the whole collected set to the final
returned handle (VERDICT r6 next-step #5). Direct operator calls with
no collector active keep the historical caller-clearCache() contract.

If a caller derives children and drops the parent handle before
collecting, the children still compute correctly — Spark's cache
substitution happens at physical planning, so a missing cache entry
means a recompute, never a wrong answer. The hook trades, at worst, a
recompute for guaranteed reclamation.
"""

from __future__ import annotations

import contextlib
import threading
import weakref
from collections.abc import Iterator

from pyspark import SparkContext
from pyspark.sql import DataFrame

_collector = threading.local()


def persist_tracked(df: DataFrame) -> DataFrame:
    """``persist()`` that enrolls the cache in the active collector.

    Under a ``collected_persists()`` scope (every registry-built query)
    the registry wrapper later ties the collected set to the final
    returned handle with ``release_on_gc`` — the cache lives exactly as
    long as the plan that scans it. With no collector active (direct
    operator calls in tests / ad-hoc sessions) this is a plain persist
    under the caller-clearCache contract, unchanged behavior."""
    df.persist()
    stack = getattr(_collector, "stack", None)
    if stack:
        stack[-1].append(df)
    return df


@contextlib.contextmanager
def collected_persists() -> Iterator[list[DataFrame]]:
    """Collect every ``persist_tracked`` cache created in this scope.

    Nested scopes are NOT opened by the registry wrapper (it checks
    ``collector_active`` first): when a registered builder composes
    another registered builder, the inner call's persists must flow to
    the OUTERMOST bucket — tying them to the inner handle, which the
    outer builder derives from and drops, would early-fire (module
    docstring). Thread-local so parallel builders can't cross-enroll."""
    stack = getattr(_collector, "stack", None)
    if stack is None:
        stack = _collector.stack = []
    bucket: list[DataFrame] = []
    stack.append(bucket)
    try:
        yield bucket
    finally:
        stack.pop()


def collector_active() -> bool:
    return bool(getattr(_collector, "stack", None))


def release_on_gc(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Unpersist every ``cached`` DataFrame when ``result`` is GC'd.

    The finalizer holds ``cached`` strongly (keeping their tiny Python
    wrappers and JVM plan refs alive until release) and ``result``
    weakly (holding it strongly would make the cycle immortal).
    """

    def _release(dfs: tuple[DataFrame, ...] = cached) -> None:
        try:
            # at interpreter exit or after session stop the JVM is
            # already reclaiming storage; never raise from a finalizer
            if SparkContext._active_spark_context is None:
                return
            for d in dfs:
                d.unpersist()
        except Exception:  # noqa: BLE001
            pass

    weakref.finalize(result, _release)
    return result
