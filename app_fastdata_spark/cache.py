"""Session-scoped materialization caches for derived artifacts.

One pattern, many consumers: an expensive derived artifact (the kNN edge
list, the MinHash-LSH candidate pair list, the graph-walk output, a
centroid/codebook broadcast) is computed AT MOST ONCE per (Spark app,
input directory, input file version) and every consumer shares the
result. At 100 TB these artifacts are the things a pipeline builds once
and STORES next to the corpus (the index directory of a vector store,
the candidate file of a dedup run); the in-session dict is the local
stand-in for that store, and ``file_stamp`` is its version key — an
in-place rewrite or append of the source parquet changes the stamp, so
the cache re-derives instead of serving stale state.

Eviction (the r11 ADVICE item): on every insert a store drops
(a) superseded stamps of the same (app, sf_dir) — a rewrite loop cannot
accumulate dead checkpoint/broadcast handles — and (b) EVERY entry whose
applicationId is not the current session's — entries from stopped
sessions hold handles bound to dead SparkContexts and would otherwise
live for process lifetime. A single re-entrant lock makes the dict
mutations thread-safe (concurrent builders may duplicate work once, but
never corrupt the store or leak an evicted handle).
"""

from __future__ import annotations

import threading
from typing import Callable, Optional

from .tables import file_stamp

_LOCK = threading.RLock()
_STORES: dict[str, dict] = {}


def stamp_key(spark, sf_dir: str, table: str) -> tuple:
    """(applicationId, sf_dir, input file stamp) — the ONE cache-key rule
    shared by every session store, so invalidation semantics cannot
    diverge between artifacts derived from the same input."""
    return (
        spark.sparkContext.applicationId,
        sf_dir,
        file_stamp(f"{sf_dir}/{table}.parquet"),
    )


def session_get(
    store: str,
    key: tuple,
    build: Callable[[], object],
    release: Optional[Callable[[object], None]] = None,
):
    """Return the cached value for ``key`` in ``store``, building it via
    ``build()`` on first use. ``release`` (e.g. Broadcast.unpersist) runs
    on every evicted value; checkpointed DataFrames need none — the
    ContextCleaner reclaims their blocks once unreferenced."""
    app_id = key[0]
    with _LOCK:
        d = _STORES.setdefault(store, {})
        if key not in d:
            for old in [k for k in d if k[:2] == key[:2] or k[0] != app_id]:
                v = d.pop(old)
                if release is not None:
                    try:
                        release(v)
                    except Exception:
                        pass  # dead-context handles: nothing to release
            d[key] = build()
        return d[key]


def session_clear(store: Optional[str] = None) -> None:
    """Drop a store (or all stores) WITHOUT releasing handles — test
    hook for simulating a cold session against the same SparkContext."""
    with _LOCK:
        if store is None:
            _STORES.clear()
        else:
            _STORES.pop(store, None)
