"""Extension operators [X]: dedup, similarity search, text analysis,
multimodal columns (BASELINE.json mandate, SURVEY.md §2.12).

Each operator module registers its driver-facing queries into the central
registry on import; ``register_all()`` is idempotent.
"""

from __future__ import annotations

_REGISTERED = False


def register_all() -> None:
    global _REGISTERED
    if _REGISTERED:
        return
    _REGISTERED = True
    # Imports are for registration side effects.
    from smfg_datawarehouse_spark.operators import (  # noqa: F401
        ann_graph,
        ann_quantized,
        dedup,
        etl_core,
        events_analytics,
        events_funnels,
        lifecycle,
        multimodal,
        olap_indexing,
        relational,
        similarity,
        streaming_certs,
        text_analysis,
        text_corpus_index,
        text_quality,
        text_sampling,
        text_sketches,
        warehouse_governance,
        warehouse_suite,
    )
