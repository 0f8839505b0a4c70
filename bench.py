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
(default 3 — raised from 2 in r9: with a ~0.3-0.6 s per-job floor and
observed 5-15% run-to-run jitter even on clean windows, min-of-2 leaves
sub-second queries systematically over-read; the third cold run costs a
few minutes of bench wall and tightens the sub-second band) cold runs —
min-of-N filters host/GC noise (observed 3-10×
spikes on otherwise-stable queries under co-tenant load) while caches are
cleared per run so every repeat still times the cold path.

The runner is STEAL-AWARE (VERDICT r7 item 1): host CPU-steal jiffies
(/proc/stat) are sampled around every repeat. min-of-2 filters a noise
spike but cannot filter a *sustained* co-tenant window (the r07 driver
record ran under ~7.5% steal for its whole 584 s and read 2.45× the
anchor), so when every repeat of a query lands above
$SPARK_GRAFT_STEAL_THRESH jiffies/sec (default 25 ≈ 0.8% of this
32-CPU host) the runner escalates that query up to
$SPARK_GRAFT_MAX_REPEATS (default 4) cold runs, keeping the min. The
per-query steal rate of the kept (fastest) run is written into the
record (``query_steal_rate``), so a contaminated record is
self-adjudicating: a reader can see exactly which timings were taken
under contention instead of inferring it from one run-level delta.
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


def time_with_escalation(
    run_once,
    repeats: int,
    max_repeats: int,
    steal_thresh: float,
    steal_fn=_steal_jiffies,
    before_attempt=None,
):
    """min-of-N timing that escalates under SUSTAINED host steal.

    ``run_once()`` executes one cold repeat and returns elapsed seconds.
    Steal jiffies are sampled around every repeat; after the base
    ``repeats`` the loop keeps going (to ``max_repeats``) while the
    fastest run so far was itself timed above ``steal_thresh``
    jiffies/sec — min-of-2 filters a spike, this filters the sustained
    co-tenant window min-of-2 cannot (the r07 driver record). Returns
    ``(best_sec, best_steal_rate_or_None, escalated_bool)``; raises
    whatever ``run_once`` raises.
    """
    best, best_rate, escalated = float("inf"), None, False
    attempt = 0
    while attempt < max_repeats:
        attempt += 1
        if before_attempt is not None:
            before_attempt()
        s0 = steal_fn()
        elapsed = run_once()
        s1 = steal_fn()
        rate = (
            (s1 - s0) / max(elapsed, 1e-3)
            if s0 is not None and s1 is not None
            else None
        )
        if elapsed < best:
            best, best_rate = elapsed, rate
        if attempt >= repeats:
            # base repeats done: stop once the kept (fastest) run was
            # timed on a clean window or steal is unreadable; otherwise
            # escalate toward max_repeats. The flag records only
            # escalations that actually RAN an extra repeat — at
            # attempt == max_repeats no further attempt follows, so
            # setting it there would claim an escalation that never
            # happened (e.g. SPARK_GRAFT_MAX_REPEATS == repeats).
            if best_rate is None or best_rate <= steal_thresh:
                break
            if attempt < max_repeats:
                escalated = True
    return best, best_rate, escalated


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    steal_before = _steal_jiffies()
    spark = get_spark(app_name="smfg-bench")

    queries = qmod.all_queries()
    # SPARK_GRAFT_ONLY=q01,x164 benches just those names (isolated
    # timing for late-round registrations / regression re-timing) —
    # filtered BEFORE warmup so the warm pass matches the timed set
    only = os.environ.get("SPARK_GRAFT_ONLY")
    if only:
        keep = {n.strip() for n in only.split(",") if n.strip()}
        unknown = keep - queries.keys()
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_ONLY names not registered: {unknown}")
        queries = {n: f for n, f in queries.items() if n in keep}
    # warmup at the smallest scale (codegen + JVM JIT)
    warm_dir = "/root/testdata/sf0.001"
    for name, fn in queries.items():
        try:
            materialize(fn(spark, warm_dir))
        except Exception:
            pass

    repeats = max(1, int(os.environ.get("SPARK_GRAFT_REPEATS", "3")))
    max_repeats = max(
        repeats, int(os.environ.get("SPARK_GRAFT_MAX_REPEATS", "4"))
    )
    # jiffies/sec of host steal above which a repeat counts as contended;
    # 32 CPUs × 100 Hz = 3200 jiffies/sec capacity, so 25 ≈ 0.8% steal.
    # Clean windows measure ~1/s here; the r07 contended window ~70/s.
    steal_thresh = float(os.environ.get("SPARK_GRAFT_STEAL_THRESH", "25"))
    timings: dict[str, float] = {}
    steal_rates: dict[str, float] = {}
    escalated: list[str] = []
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
        # caches are scoped per query invocation (dedup prefix tables,
        # LSH signatures); drop them before every repeat so leftovers
        # don't skew timings via memory pressure AND each repeat stays
        # cold. One failing query must degrade to a recorded failure,
        # not zero out the whole bench record (the round-1 rc=1 mode).
        try:
            best, best_rate, esc = time_with_escalation(
                lambda: run_query(fn, spark, sf_dir),
                repeats,
                max_repeats,
                steal_thresh,
                before_attempt=spark.catalog.clearCache,
            )
        except Exception as exc:  # noqa: BLE001 — record and continue
            failed[name] = repr(exc)[:200]
            continue
        timings[name] = round(best, 4)
        if best_rate is not None:
            steal_rates[name] = round(best_rate, 2)
        if esc:
            escalated.append(name)

    out = {
        "metric": "total_wall_sec",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if failed:
        out["failed"] = failed

    # subset runs (SPARK_GRAFT_ONLY) must never clobber the full-suite
    # record: they default to stdout-only unless an output is named
    bench_out = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        "" if only else os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"
        ),
    )
    if bench_out:
        local = dict(out)
        local["steal_jiffies_before"] = steal_before
        local["steal_jiffies_after"] = _steal_jiffies()
        local["repeats"] = repeats
        # per-query steal rate (jiffies/sec) of each KEPT run + which
        # queries needed contention escalation — makes a contaminated
        # record self-adjudicating (VERDICT r7 item 1)
        local["query_steal_rate"] = steal_rates
        local["steal_threshold"] = steal_thresh
        if escalated:
            local["steal_escalated"] = escalated
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
    # contention summary in the driver-visible line: how many kept runs
    # were timed above the steal threshold despite escalation, and the
    # run-level steal delta — a reader can adjudicate a slow record
    # without opening BENCH_LOCAL.json
    steal_after = _steal_jiffies()
    if steal_before is not None and steal_after is not None:
        compact["steal_jiffies_run"] = steal_after - steal_before
    contended = [n for n, r in steal_rates.items() if r > steal_thresh]
    if contended:
        compact["contended_queries"] = len(contended)
        compact["contended_sec"] = round(
            sum(timings[n] for n in contended), 2
        )
    if failed:
        compact["failed"] = {k: v[:40] for k, v in failed.items()}
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
