"""Benchmark runner — headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "total_wall_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Also writes the full record (plus host steal-jiffies before/after, so a
co-tenant-inflated run is distinguishable from a regression) to
``BENCH_LOCAL.json`` in the repo root — the stdout line can exceed the
driver's tail capture, and the committed file is what cross-round
per-query regression checks diff against. Override the path with
``$SPARK_GRAFT_BENCH_OUT`` (empty string disables the file write).

Each query is materialized through a full-width xxhash64 checksum
aggregation, so every projection expression is forced — under a bare
count() Catalyst prunes unreferenced columns and map-only queries would
be timed without evaluating their transforms. A warmup pass on sf0.001
triggers JIT/codegen
before timing. Each query's recorded time is the MIN of $SPARK_GRAFT_REPEATS
(default 2) cold runs — min-of-N filters host/GC noise (observed 3-10×
spikes on otherwise-stable queries under co-tenant load) while caches are
cleared per run so every repeat still times the cold path.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F
from pyspark.sql.types import MapType

from smfg_datawarehouse_spark import queries as qmod
from smfg_datawarehouse_spark.session import get_spark


def materialize(df) -> None:
    """Force FULL evaluation of every output column.

    bit_xor(xxhash64(*cols)) references every column, so Catalyst cannot
    prune any projection expression (a bare count() lets it drop them all);
    XOR can't overflow under ANSI mode the way sum(long) does.
    MapType isn't hashable in Spark — cast those columns to string first.
    """
    cols = [
        F.col(f.name).cast("string") if isinstance(f.dataType, MapType)
        else F.col(f.name)
        for f in df.schema.fields
    ]
    df.select(F.bit_xor(F.xxhash64(*cols)).alias("chk")).collect()


def run_query(fn, spark, sf_dir) -> float:
    t0 = time.perf_counter()
    materialize(fn(spark, sf_dir))
    return time.perf_counter() - t0


def _steal_jiffies() -> int | None:
    """Host CPU-steal jiffies (8th field of /proc/stat cpu line). Steal is
    invisible to ps/top inside the VM but inflates wall times ~1.4-2x under
    co-tenant load; recording before/after lets a reader judge the run."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        return int(parts[8]) if len(parts) > 8 else None
    except (OSError, ValueError, IndexError):
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    steal_before = _steal_jiffies()
    spark = get_spark(app_name="smfg-bench")

    queries = qmod.all_queries()
    # warmup at the smallest scale (codegen + JVM JIT)
    warm_dir = "/root/testdata/sf0.001"
    for name, fn in queries.items():
        try:
            materialize(fn(spark, warm_dir))
        except Exception:
            pass

    repeats = max(1, int(os.environ.get("SPARK_GRAFT_REPEATS", "2")))
    timings: dict[str, float] = {}
    failed: dict[str, str] = {}
    import gc

    for qi, (name, fn) in enumerate(sorted(queries.items())):
        # localCheckpoint blocks are NOT SQL cache: they're RDD blocks the
        # ContextCleaner releases only after BOTH a Python GC (drops the
        # py4j wrappers) and a JVM GC (fires the weak references). Without
        # the nudges below they accumulate across the ~320-query suite and
        # the storage-memory pressure inflates later queries — the r5/r6
        # "balloons under full-suite load" mechanism. Both run OUTSIDE the
        # timed window.
        gc.collect()
        if qi % 20 == 0:
            spark.sparkContext._jvm.System.gc()
        best = float("inf")
        for _ in range(repeats):
            # caches are scoped per query invocation (dedup prefix tables,
            # LSH signatures); drop them before every run so leftovers don't
            # skew timings via memory pressure AND each repeat stays cold
            spark.catalog.clearCache()
            # one failing query must degrade to a recorded failure, not
            # zero out the whole bench record (the round-1 rc=1 mode)
            try:
                best = min(best, run_query(fn, spark, sf_dir))
            except Exception as exc:  # noqa: BLE001 — record and continue
                failed[name] = repr(exc)[:200]
                break
        if name not in failed:
            timings[name] = round(best, 4)

    out = {
        "metric": "total_wall_sec",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if failed:
        out["failed"] = failed

    bench_out = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_LOCAL.json"),
    )
    if bench_out:
        local = dict(out)
        local["steal_jiffies_before"] = steal_before
        local["steal_jiffies_after"] = _steal_jiffies()
        local["repeats"] = repeats
        try:
            with open(bench_out, "w") as fh:
                json.dump(local, fh, indent=1, sort_keys=True)
                fh.write("\n")
        except OSError:
            pass  # stdout line is the contract; the file is best-effort

    # stdout line must fit the driver's 2 KB tail capture (full per-query
    # records live in BENCH_LOCAL.json): report the 20 heaviest queries
    # inline, totals for everything
    top20 = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:20]
    )
    compact = {
        "metric": "total_wall_sec",
        "value": out["value"],
        "unit": "sec",
        "queries": top20,
        "n_queries": len(timings),
        "full_record": "BENCH_LOCAL.json",
        "sf": sf,
    }
    if failed:
        compact["failed"] = {k: v[:40] for k, v in failed.items()}
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
