"""Catalog: imports every operator module (triggering registration) and
exposes the assembled queries/oracles dicts for the driver contract.
"""

from __future__ import annotations

from . import registry


def _load_all() -> None:
    # Import for side effects: each module registers its queries.
    from .functions import ip  # noqa: F401
    from .operators import (  # noqa: F401
        dedup,
        enrich,
        export_views,
        joins,
        pipeline_e2e,
        retention,
        serving,
        sessions,
        similarity,
        stats,
        textops,
        tpch,
        views,
    )
    from .ml import kmeans, kmeans_udtf  # noqa: F401
    from .operators import multimodal  # noqa: F401
    from .plans import skew  # noqa: F401
    from .sources import generator  # noqa: F401
    from .streaming import stateful  # noqa: F401


_loaded = False


def queries():
    global _loaded
    if not _loaded:
        _load_all()
        _loaded = True
    return registry.queries()


def oracles():
    global _loaded
    if not _loaded:
        _load_all()
        _loaded = True
    return registry.oracles()
